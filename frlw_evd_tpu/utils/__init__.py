"""Utilities: native kernel bindings, metrics, logging, profiling."""

from .metric import AverageMeter, MeterBuffer
from .profiling import Timer, flops_report
from .logger import setup_logger
from .demo_utils import multiclass_nms, nms, xyxy2cxcywh, cxcywh2xyxy
