"""Multi-process batch assembly over shared memory.

TPU-native replacement for the reference's multi-worker DataLoader
(reference: engine.py:51-62 — torch DataLoader with num_workers,
pin_memory).  Worker processes each own an :class:`RLBenchDataset` (with
its own episode cache and RNG stream) and assemble full fixed-shape
batches directly into preallocated ``multiprocessing.shared_memory``
slots; the parent hands out free slots and receives ready ones through
queues, so steady-state cost in the parent is one memcpy per batch (or
zero with ``copy=False``).

Workers start via **forkserver** (fallback: spawn) — never fork: the
parent runs multithreaded JAX, and fork()ing a multithreaded process can
deadlock the child in a held allocator/runtime lock (exactly the torch
DataLoader-with-CUDA hazard; a real many-core TPU host is where it
bites).  Consequence: ``dataset_factory`` must be *picklable* — a
module-level function or ``functools.partial`` over one, not a closure.

Layering: MultiProcessSampler (host batches) → DeviceFeeder (async H2D)
→ jitted train step.  On a many-core host the workers hide decode +
augmentation behind device compute; the assembly cost measured by
``bench_data.py`` divides by the worker count.
"""

from __future__ import annotations

import functools
import multiprocessing as mp
from multiprocessing import shared_memory
from typing import Callable, Dict, Iterator, List, Tuple

import numpy as np

__all__ = ["MultiProcessSampler", "rlbench_dataset_factory"]


def _build_rlbench_dataset(dataset_kwargs, base_seed, seed):
    from .dataset import RLBenchDataset

    return RLBenchDataset(
        **{**dataset_kwargs, "seed": base_seed + 1000 * (seed + 1)}
    )


def rlbench_dataset_factory(dataset_kwargs: dict, base_seed: int):
    """Picklable worker-dataset factory (forkserver/spawn-safe): worker
    ``w`` receives seed ``base_seed + 1000*(w+1)`` — disjoint
    augmentation/sampling RNG streams per worker (the reference seeds
    DataLoader workers similarly, engine.py:40-44)."""
    return functools.partial(
        _build_rlbench_dataset, dict(dataset_kwargs), base_seed
    )

_SENTINEL = -1

# Segments whose mapping must outlive their sampler because a copy=False
# consumer still holds zero-copy views into them at close() time (see
# MultiProcessSampler.close): kept for the process lifetime rather than
# unmapping memory under live arrays.
_UNCLOSED: List[shared_memory.SharedMemory] = []


def _worker_loop(factory, seed, batch_size, schema, shm_names, free_q, ready_q):
    dataset = factory(seed)
    shms = {i: shared_memory.SharedMemory(name=n) for i, n in shm_names.items()}
    views = {
        i: _views_from_shm(shm, schema) for i, shm in shms.items()
    }
    try:
        while True:
            slot = free_q.get()
            if slot == _SENTINEL:
                break
            batch = dataset.sample_batch(batch_size)
            aux = {}
            for key, arr in batch.items():
                if key in views[slot]:
                    np.copyto(views[slot][key], arr, casting="same_kind")
                else:  # non-array metadata (e.g. task names) goes by pickle
                    aux[key] = arr
            ready_q.put((slot, aux))
    except (KeyboardInterrupt, EOFError, BrokenPipeError):
        pass
    finally:
        for shm in shms.values():
            shm.close()


def _views_from_shm(shm, schema) -> Dict[str, np.ndarray]:
    views = {}
    offset = 0
    for key, (shape, dtype) in schema.items():
        n = int(np.prod(shape)) * np.dtype(dtype).itemsize
        views[key] = np.ndarray(shape, dtype, buffer=shm.buf, offset=offset)
        offset += n
    return views


class MultiProcessSampler:
    """Iterator of host batches assembled by worker processes.

    Args:
      dataset_factory: seed -> dataset exposing ``sample_batch(batch_size)``.
        Called once per worker *in the worker process*.  Must be picklable
        (forkserver/spawn start methods): a module-level function or a
        ``functools.partial`` over one.
      batch_size: samples per batch.
      num_workers: worker process count.
      slots_per_worker: shared-memory batches in flight per worker.
      copy: if True (default) ``__next__`` returns fresh arrays and recycles
        the slot immediately.  With False it returns zero-copy views and the
        previous batch's slot is recycled on the following ``__next__`` —
        the consumer must be done with a batch (e.g. H2D transfer complete)
        before requesting the next one, and must drop all views before (or
        promptly after) ``close()``: segments still referenced at close()
        stay mapped for the process lifetime (never unmapped under a live
        array) but their shared-memory names are unlinked immediately.
    """

    def __init__(
        self,
        dataset_factory: Callable[[int], object],
        batch_size: int,
        num_workers: int = 2,
        slots_per_worker: int = 2,
        copy: bool = True,
    ):
        probe = dataset_factory(0).sample_batch(batch_size)
        self._schema: Dict[str, Tuple[tuple, np.dtype]] = {
            k: (v.shape, v.dtype)
            for k, v in probe.items()
            if isinstance(v, np.ndarray)
        }
        nbytes = sum(
            int(np.prod(s)) * np.dtype(d).itemsize
            for s, d in self._schema.values()
        )

        # forkserver: workers fork from a clean single-threaded server
        # process, never from the (multithreaded, JAX-initialised) parent.
        try:
            ctx = mp.get_context("forkserver")
        except ValueError:  # platform without forkserver
            ctx = mp.get_context("spawn")
        self._handed_out_views = False
        self._free_q = ctx.Queue()
        self._ready_q = ctx.Queue()
        self._shms: List[shared_memory.SharedMemory] = []
        self._procs: List = []
        self._pending_recycle: int | None = None
        self._copy = copy

        n_slots = num_workers * slots_per_worker
        for _ in range(n_slots):
            self._shms.append(shared_memory.SharedMemory(create=True, size=nbytes))
        shm_names = {i: s.name for i, s in enumerate(self._shms)}
        self._views = {
            i: _views_from_shm(s, self._schema) for i, s in enumerate(self._shms)
        }
        for i in range(n_slots):
            self._free_q.put(i)
        for w in range(num_workers):
            p = ctx.Process(
                target=_worker_loop,
                args=(
                    dataset_factory, w + 1, batch_size, self._schema,
                    shm_names, self._free_q, self._ready_q,
                ),
                daemon=True,
            )
            p.start()
            self._procs.append(p)

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        if self._pending_recycle is not None:
            self._free_q.put(self._pending_recycle)
            self._pending_recycle = None
        slot, aux = self._ready_q.get()
        views = self._views[slot]
        if self._copy:
            batch = {k: v.copy() for k, v in views.items()}
            self._free_q.put(slot)
        else:
            batch = dict(views)
            self._pending_recycle = slot
            self._handed_out_views = True
        batch.update(aux)
        return batch

    def close(self):
        for _ in self._procs:
            self._free_q.put(_SENTINEL)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        # A copy=False consumer may still hold zero-copy views into the
        # segments (numpy does not keep a PEP-3118 export open, so
        # shm.close() would silently unmap under the live array and any
        # later read would segfault).  If any view was ever handed out,
        # unlink the names (freeing them system-wide) but keep the
        # mappings alive for the process lifetime in _UNCLOSED.
        self._views = {}
        self._pending_recycle = None
        leak = not self._copy and self._handed_out_views
        for s in self._shms:
            try:
                s.unlink()
            except FileNotFoundError:
                pass
            if leak:
                _UNCLOSED.append(s)
            else:
                s.close()
        self._shms = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
