"""Device memory monitoring.

Reference behaviour: xclip/callbacks.py:56-163 CudaMemoryMonitor — polls
nvidia-smi CSV for per-device memory metrics during training. The TPU
equivalent reads `device.memory_stats()` (bytes in use / limit / peak) for
every local device; no subprocess needed.
"""

from __future__ import annotations

from typing import Dict, List

import jax


def get_memory_stats() -> List[Dict[str, float]]:
    """Per-device memory metrics in MiB (mirrors the reference's
    memory.used / memory.total CSV fields)."""
    stats = []
    for device in jax.local_devices():
        raw = device.memory_stats() or {}
        stats.append(
            {
                "device": str(device),
                "memory.used": raw.get("bytes_in_use", 0) / 2**20,
                "memory.total": raw.get("bytes_limit", 0) / 2**20,
                "memory.peak": raw.get("peak_bytes_in_use", 0) / 2**20,
            }
        )
    return stats


def log_memory_stats(logger=None, step: int = 0, prefix: str = "memory") -> List[Dict[str, float]]:
    stats = get_memory_stats()
    if logger is not None:
        for i, s in enumerate(stats):
            for key in ("memory.used", "memory.peak"):
                logger.add_scalar(f"{prefix}/device{i}/{key}", s[key], step)
    return stats
