"""Per-worker-process object cache for broadcast state.

Stateless map_batches tasks are cheaper than actor pools for light stages
(no pool spin-up per Dataset execution), but naively calling ``ray.get`` on
a broadcast ObjectRef inside every task re-deserializes the payload per
call.  Ray worker processes persist across tasks and executions, so a
module-level cache keyed by ObjectRef gives once-per-process
deserialization — the broadcast-small-side pattern without actor pools.
Derived state (e.g. parsed robots rules) caches via ``build``.
"""

from __future__ import annotations

from typing import Any, Callable

import ray

_PROC_CACHE: dict[str, Any] = {}


def cached_get(ref, build: Callable[[Any], Any] | None = None, key: str | None = None):
    if isinstance(ref, ray.ObjectRef):
        k = ref.hex()
    else:
        k = key if key is not None else str(id(ref))
    if build is not None:
        k += ":built"
    if k not in _PROC_CACHE:
        obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        _PROC_CACHE[k] = build(obj) if build is not None else obj
    return _PROC_CACHE[k]
