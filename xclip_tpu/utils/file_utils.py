"""Checkpoint/log remote sync + checkpoint loading helpers.

Reference behaviour: deps/open_clip/src/training/file_utils.py:10-90 —
``remote_sync`` copies the experiment directory to a remote location via
fsspec or the s3 CLI, ``start_sync_process`` runs it in a background
``multiprocessing.Process`` loop every N seconds (wired by
training/main.py:168-189), and ``pt_load`` reads (possibly remote)
checkpoints.
"""

from __future__ import annotations

import logging
import multiprocessing
import subprocess
import time

def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    result = subprocess.run(
        ["aws", "s3", "sync", local_dir, remote_dir, "--exclude", "*epoch_latest.pt"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    if result.returncode != 0:
        logging.error(f"Error: Failed to sync with S3 bucket {result.stderr.decode()}")
        return False
    return True


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    try:
        import fsspec
    except ImportError:
        logging.error("fsspec unavailable")
        return False

    a = fsspec.get_mapper(local_dir)
    b = fsspec.get_mapper(remote_dir)
    for k in a:
        # skip the mutating latest pointer (reference :29)
        if "epoch_latest.pt" in k:
            continue
        try:
            if k in b and len(a[k]) == len(b[k]):
                continue
            b[k] = a[k]
        except Exception as e:  # pragma: no cover - remote-dependent
            logging.info(f"Error during remote sync for {k}: {e}")
            return False
    return True


def remote_sync(local_dir: str, remote_dir: str, protocol: str) -> bool:
    logging.info("Starting remote sync.")
    if protocol == "s3":
        return remote_sync_s3(local_dir, remote_dir)
    if protocol == "fsspec":
        return remote_sync_fsspec(local_dir, remote_dir)
    logging.error("Remote protocol not known")
    return False


def keep_running_remote_sync(sync_every: float, local_dir: str, remote_dir: str, protocol: str):
    while True:
        time.sleep(sync_every)
        remote_sync(local_dir, remote_dir, protocol)


def start_sync_process(sync_every: float, local_dir: str, remote_dir: str, protocol: str):
    """Background sync loop (reference :56-62); caller starts/terminates it."""
    return multiprocessing.Process(
        target=keep_running_remote_sync,
        args=(sync_every, local_dir, remote_dir, protocol),
        daemon=True,
    )


def pt_load(file_path: str, map_location=None):
    """Load a (possibly remote) torch checkpoint (reference :70-77)."""
    if file_path.startswith("s3"):
        logging.info("Loading remote checkpoint, which may take a bit.")
    import torch

    try:
        import fsspec

        of = fsspec.open(file_path, "rb")
        with of as f:
            return torch.load(f, map_location=map_location, weights_only=False)
    except ImportError:
        with open(file_path, "rb") as f:
            return torch.load(f, map_location=map_location, weights_only=False)
