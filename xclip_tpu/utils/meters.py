"""Timing meters + logging setup.

Reference behaviour: AverageMeter + data/gpu/batch-time meters and the
samples/s math (deps/open_clip/src/training/train.py:38-61,82-85,216-233),
rank-aware logger (training/logger.py:4-30). These meters define the
benchmark metric, so their math is preserved exactly.
"""

from __future__ import annotations

import logging
import sys


class AverageMeter:
    """Running average over a log window (reference train.py:38-51)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def samples_per_second(accum_freq: int, batch_size: int, world_size: int, batch_time: float) -> float:
    return accum_freq * batch_size * world_size / batch_time


def samples_per_second_per_chip(accum_freq: int, batch_size: int, batch_time: float) -> float:
    return accum_freq * batch_size / batch_time


def setup_logging(log_file, level=logging.INFO, include_host: bool = False):
    if include_host:
        import socket

        hostname = socket.gethostname()
        formatter = logging.Formatter(
            f"%(asctime)s | {hostname} | %(levelname)s | %(message)s", datefmt="%Y-%m-%d,%H:%M:%S"
        )
    else:
        formatter = logging.Formatter(
            "%(asctime)s | %(levelname)s | %(message)s", datefmt="%Y-%m-%d,%H:%M:%S"
        )

    logging.root.setLevel(level)
    # drop handlers from previous sessions (repeated main() calls in tests
    # would otherwise write to closed files)
    for handler in list(logging.root.handlers):
        logging.root.removeHandler(handler)

    stream_handler = logging.StreamHandler(sys.stdout)
    stream_handler.setFormatter(formatter)
    logging.root.addHandler(stream_handler)

    if log_file:
        file_handler = logging.FileHandler(filename=log_file)
        file_handler.setFormatter(formatter)
        logging.root.addHandler(file_handler)
