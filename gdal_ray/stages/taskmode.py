"""Task-mode stateful stages.

``map_batches(Cls, concurrency=N)`` pays a multi-second actor-pool
spin-up on EVERY execution; on long-lived Ray worker processes the same
once-per-worker state reuse comes from a process-level instance cache
(the pattern stages/warp.py uses for its transformer cache).  Use
``stage_fn(Cls, kwargs)`` as a plain task-mode batch fn; keep the actor
form behind a ``use_actors`` flag for long-lived cluster deployments
where an explicitly sized pool is wanted.
"""
from __future__ import annotations

import ray

_CACHE: dict = {}


def stage_fn(cls, kwargs: dict | None = None):
    """Plain function for map_batches that lazily builds ``cls(**kwargs)``
    once per worker process and reuses it across batches/executions.
    Object-ref kwargs key by ref identity, everything else by repr."""
    kwargs = kwargs or {}

    def _k(v):
        return v.hex() if isinstance(v, ray.ObjectRef) else repr(v)

    key = (cls.__module__, cls.__qualname__, id(cls),
           tuple(sorted((k, _k(v)) for k, v in kwargs.items())))

    def fn(batch):
        st = _CACHE.get(key)
        if st is None:
            if len(_CACHE) > 8:          # bound per-worker state
                _CACHE.clear()
            st = cls(**kwargs)
            _CACHE[key] = st
        return st(batch)

    return fn
