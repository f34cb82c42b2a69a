"""Double-buffered host→device batch feed.

Replaces the reference's DataLoader workers + pin_memory
(reference: engine.py:51-62) with a background prefetch thread that
overlaps host batch assembly and H2D transfer with device compute:
``jax.device_put`` is async, so keeping `prefetch` batches in flight hides
the transfer behind the previous step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax

__all__ = ["DeviceFeeder"]


class DeviceFeeder:
    def __init__(
        self,
        batch_fn: Callable[[], dict],
        sharding=None,
        prefetch: int = 2,
    ):
        """batch_fn: returns the next host batch (numpy pytree)."""
        self._batch_fn = batch_fn
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            batch = self._batch_fn()
            host_arrays = {
                k: v for k, v in batch.items() if not isinstance(v, list)
            }
            aux = {k: v for k, v in batch.items() if isinstance(v, list)}
            if self._sharding is not None:
                device = jax.tree.map(
                    lambda x: jax.device_put(x, self._sharding), host_arrays
                )
            else:
                device = jax.tree.map(jax.device_put, host_arrays)
            device.update(aux)
            while not self._stop.is_set():
                try:
                    self._q.put(device, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
