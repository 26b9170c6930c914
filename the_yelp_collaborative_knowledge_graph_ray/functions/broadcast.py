"""Worker-process-level cache for broadcast (``ray.put``) objects.

The pattern: build an expensive stateful object ONCE on the driver
(automaton, rewrite map, scoring index), ``ray.put`` it, and run the
per-batch work as STATELESS ``map_batches`` tasks that fetch it through
this cache. Compared to the actor-pool idiom (build in ``__init__`` per
actor) this removes the pool's startup tail entirely — no actor process
spawns, no per-actor rebuild of the same structure, and no actor-pool
minimum-slot deadlocks at low CPU counts (see the verify notes) — while
keeping the same once-per-worker cost model: ``ray.get`` of a plasma
object is zero-copy for numpy/Arrow buffers, and this cache makes the
Python-side deserialization (pattern lists, dicts) happen once per worker
process instead of once per task.

At 100 TB the difference compounds: a 256-node cluster running a
16-actor pool per node would build the automaton 4096 times; with the
broadcast object it is built once and fetched zero-copy everywhere.
"""

from __future__ import annotations

import ray

_CACHE: dict = {}
_CACHE_MAX = 8


def broadcast_map_batches(ds, factory, **map_kw):
    """``map_batches`` with a driver-BUILT read-only callable broadcast
    once: ``factory()`` constructs the stateful callable on the driver,
    the instance is ``ray.put`` a single time, and every task fetches it
    through :func:`cached_object`. Drop-in replacement for
    ``map_batches(Cls, concurrency=(1, N))`` actor pools whose per-actor
    state is immutable — removes the pool spawn/ramp tail and lets the
    stage fuse with its upstream."""
    obj_ref = ray.put(factory())

    def apply(batch):
        return cached_object(obj_ref)(batch)

    return ds.map_batches(apply, **map_kw)


def cached_object(ref):
    """Fetch-and-cache a broadcast object by its ObjectRef (pass-through
    for plain objects, so driver-side/unit-test callers can hand the raw
    object). Bounded true LRU (hits refresh recency — workers interleave
    tasks of several stages, so a hot object fetched early must not be the
    first evicted): a handful of slots avoids thrash without pinning
    unbounded plasma."""
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key in _CACHE:
        _CACHE[key] = _CACHE.pop(key)  # move to MRU end
        return _CACHE[key]
    if len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))  # evict LRU (oldest-use) entry
    _CACHE[key] = ray.get(ref)
    return _CACHE[key]
