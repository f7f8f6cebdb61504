"""Datasets and host-side input pipeline.

Two modes (SURVEY.md §7.3):
  * precomputed — read the reference-format uint8 blobs
    (`<stream>_<timestamp>.npy` raw byte files, incl. the TAF bins{K/2}/bins{K}
    split) for checkpoint-parity training/eval;
  * streaming — raw events → on-device encode → detect (data/fetcher.py
    resurrection; see frlw_evd_tpu.data.fetcher).
"""

from .dataset import PropheseeDataset, PropheseeTafDataset, GEN1_CLASSES, GEN4_CLASSES
from .augment import augment_sample, xyxy2cxcywh
from .loader import Loader, collate_batch
