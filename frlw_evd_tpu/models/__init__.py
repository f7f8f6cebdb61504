"""Flax model zoo: backbones, necks, heads, stems, memory cells, detectors.

NHWC layout throughout (TPU-native). Module/parameter names mirror the
reference's attribute names so released .pth checkpoints map 1:1
(train/checkpoints.py does the conversion).
"""

from .blocks import (
    BaseConv,
    DWConv,
    Bottleneck,
    ResLayer,
    SPPBottleneck,
    CSPLayer,
    Focus,
    get_activation,
)
from .darknet import Darknet, CSPDarknet
from .pafpn import YOLOPAFPN, YOLOFPN
from .stems import TemporalActiveFocus, BinsFusionModule
from .heads import YOLOXHead
from .detector import EventDetector, build_detector
from .yolov3 import YOLOv3Detector
from .memory import ConvLSTMCell, ConvGRUCell, MemoryModel
from .seq_nms import seq_nms, SeqNMSState
from .red import REDDetector
from .detector import MemoryEventDetector
