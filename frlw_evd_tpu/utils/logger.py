"""Run logging (reference: core/yolox/utils/logger.py — loguru setup with a
per-run file sink and stdout mirroring; loguru isn't available here, so this
uses stdlib logging with the same surface)."""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional


def setup_logger(save_dir: Optional[str] = None, distributed_rank: int = 0,
                 filename: str = "log.txt", mode: str = "a") -> logging.Logger:
    """Configure the framework logger; rank != 0 processes stay silent on
    stdout (reference behavior) but still return a logger object."""
    logger = logging.getLogger("frlw_evd_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s", "%Y-%m-%d %H:%M:%S")
    if distributed_rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        fh = logging.FileHandler(
            os.path.join(save_dir, f"file_{stamp}_{filename}"), mode=mode)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
