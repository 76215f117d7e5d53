"""Task-fusion helper: run a stateful batch-stage as STATELESS TASKS with
per-worker-process cached state.

Ray Data fuses adjacent TaskPool operators (read → transform) into one —
batches never take an object-store hop between them — but only for plain
functions, not actor pools. A module-global cache keyed per wiring gives
the function the same once-per-worker state an actor would hold
(Ray reuses worker processes across tasks). Measured on the extract
stage: +25–40% over the best-tuned actor pool, zero pool sizing
(BASELINE.md note 5).

Use an actor pool instead when the stage must pin resources (GPUs, a
bounded-memory model) or needs autoscaling isolation.
"""

from __future__ import annotations

import itertools

_WORKER_CACHE: dict = {}
_KEYS = itertools.count()


def fused(factory, key: str | None = None):
    """Wrap ``factory() -> callable-batch-stage`` as a task function with
    per-worker cached construction. ``factory`` may close over
    ray.ObjectRef broadcasts (resolved once per worker at first batch)."""
    if key is None:
        key = f"fused-{next(_KEYS)}"

    def stage_fn(batch):
        inst = _WORKER_CACHE.get(key)
        if inst is None:
            inst = _WORKER_CACHE[key] = factory()
        return inst(batch)

    return stage_fn


def map_stage(ds, factory, *, concurrency="tasks", batch_size=None,
              batch_format: str = "pyarrow", zero_copy_batch: bool = True):
    """Wire a stage task-fused (default); pass an int/tuple ``concurrency``
    to cap parallelism (still tasks — per-worker cache works either way)."""
    kwargs: dict = {}
    if concurrency not in ("tasks", None):
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        fused(factory),
        batch_format=batch_format,
        zero_copy_batch=zero_copy_batch,
        batch_size=batch_size,
        **kwargs,
    )
