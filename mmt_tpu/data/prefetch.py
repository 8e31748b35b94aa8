"""Multiprocess input pipeline: shard loaders across worker processes.

The reference leaned on tf.data's C++ thread pool for input throughput
(AUTOTUNE maps, interleave; SURVEY section 3.3).  Here the host pipeline
is numpy/PIL Python, so parallelism comes from worker *processes*: each
worker runs the same loader over a disjoint file/record shard and ships
finished numpy batches through a queue; the parent multiplexes
round-robin (deterministic given worker count and per-shard seeds).

Use ``MmtDataConfig.num_workers > 0`` (wired through the train CLI) or
wrap any loader factory directly:

    batches = multiprocess_batches(
        lambda shard, nshards: MmtPretrainLoader(cfg).load(shard, nshards),
        num_workers=8)
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
import queue as queue_lib
import warnings
from typing import Callable, Iterator, Optional

_STOP = "__stop__"


class LoaderShard:
    """Picklable ``loader_fn``: workers run under the *spawn* start
    method (fork from a multi-threaded JAX parent risks deadlocks), so
    the callable crossing the process boundary must pickle.  Configs are
    plain dataclasses and loader classes resolve by module path; each
    worker constructs its own loader."""

    def __init__(self, loader_cls, config, batch_size: Optional[int] = None):
        self.loader_cls = loader_cls
        self.config = config
        self.batch_size = batch_size

    def __call__(self, shard: int, num_shards: int) -> Iterator[dict]:
        return self.loader_cls(self.config).load(
            shard, num_shards, batch_size=self.batch_size
        )


def _worker(loader_fn, shard, num_shards, out_queue, binding_lines):
    try:
        if binding_lines:
            # Spawn workers re-import every module fresh, so gin-style
            # bindings applied in the parent (--gin_file/--gin_params)
            # must be re-applied here or loaders would silently build
            # with unbound defaults.
            from mmt_tpu.utils.bindings import apply_bindings

            apply_bindings(params=binding_lines)
        for batch in loader_fn(shard, num_shards):
            out_queue.put(batch)
    finally:
        out_queue.put(_STOP)


def multiprocess_batches(
    loader_fn: Callable[[int, int], Iterator[dict]],
    num_workers: int,
    prefetch_per_worker: int = 4,
    base_shard: int = 0,
    total_shards: int = 1,
) -> Iterator[dict]:
    """Yields batches from ``num_workers`` processes, round-robin.

    ``loader_fn(shard_index, num_shards)`` must return a fresh batch
    iterator; workers get shards ``base_shard * num_workers + i`` of
    ``total_shards * num_workers`` (composing host-level sharding with
    worker-level sharding).
    """
    if num_workers <= 0:
        yield from loader_fn(base_shard, total_shards)
        return

    try:
        pickle.dumps(loader_fn)
        ctx = mp.get_context("spawn")
    except Exception:
        warnings.warn(
            "loader_fn is not picklable: falling back to fork workers "
            "(pass a prefetch.LoaderShard to use spawn, which is safe "
            "under a multi-threaded JAX parent)"
        )
        ctx = mp.get_context("fork")
    from mmt_tpu.utils.bindings import snapshot_bindings

    binding_lines = tuple(snapshot_bindings())
    queues = []
    procs = []
    for i in range(num_workers):
        q = ctx.Queue(maxsize=prefetch_per_worker)
        p = ctx.Process(
            target=_worker,
            args=(loader_fn, base_shard * num_workers + i,
                  total_shards * num_workers, q, binding_lines),
            daemon=True,
        )
        p.start()
        queues.append(q)
        procs.append(p)

    live = [True] * num_workers
    try:
        while any(live):
            for i, q in enumerate(queues):
                if not live[i]:
                    continue
                try:
                    item = q.get(timeout=300)
                except queue_lib.Empty as e:
                    raise RuntimeError(f"input worker {i} stalled") from e
                if isinstance(item, str) and item == _STOP:
                    live[i] = False
                    continue
                yield item
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join(timeout=5)
