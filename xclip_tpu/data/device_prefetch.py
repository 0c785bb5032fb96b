"""Host→device transfer overlap: double-buffered batch placement.

The reference hides input latency with torch DataLoader workers feeding
pinned-memory tensors that `.to(device, non_blocking=True)` overlaps with
compute (deps/open_clip/src/training/train.py:98-101). The JAX equivalent is
to run `jax.device_put` (with the data-axis `NamedSharding`) on a background
thread so that while the device executes step N, batch N+1 is already in
flight over PCIe/DMA (or the relay link on a tunneled terminal, where the
transfer — not the decode — is the e2e ceiling; see bench.py run_e2e).

`jax.device_put` is thread-safe and returns immediately with an array whose
buffers fill asynchronously; the consuming step dispatch then enqueues after
the transfer completes, without the host loop ever blocking on either.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class DevicePrefetcher:
    """Iterate device-resident batches, transferring ``depth`` batches ahead.

    Parameters
    ----------
    batches: host-batch iterable (e.g. a ``DataLoader`` epoch).
    place: host batch -> device batch (e.g. ``partial(shard_batch, mesh)``).
    depth: how many placed batches to keep in flight (2 = double buffering —
        enough to overlap one full transfer with one step; more only helps
        when transfer time is burstier than compute).

    The background thread owns the host iterator; early exit (``break``) is
    handled by a stop flag + queue drain so the thread never leaks.
    """

    def __init__(self, batches: Iterable, place: Callable, depth: int = 2):
        self.batches = batches
        self.place = place
        self.depth = depth

    def __iter__(self) -> Iterator:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        err: list = []

        def produce():
            try:
                for batch in self.batches:
                    if stop.is_set():
                        return
                    placed = self.place(batch)
                    while not stop.is_set():
                        try:
                            out_q.put(placed, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as exn:  # surfaced on the consumer side
                err.append(exn)
            finally:
                while True:
                    try:
                        out_q.put(None, timeout=0.5)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        worker = threading.Thread(target=produce, daemon=True, name="device-prefetch")
        worker.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    if err:
                        raise err[0]
                    break
                yield batch
        finally:
            stop.set()
            while worker.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def prefetch_to_device(batches: Iterable, mesh, depth: int = 2,
                       place: Optional[Callable] = None) -> DevicePrefetcher:
    """Convenience wrapper: prefetch with the standard data-axis placement."""
    if place is None:
        from xclip_tpu.parallel.mesh import shard_batch

        place = lambda b: shard_batch(mesh, b)
    return DevicePrefetcher(batches, place, depth=depth)
