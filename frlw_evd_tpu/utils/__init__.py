"""Utilities: native kernel bindings, metrics, logging, profiling."""

from .metric import AverageMeter, MeterBuffer
from .profiling import Timer, flops_report
