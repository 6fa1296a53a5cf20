"""Small runtime helpers."""

from __future__ import annotations

import ray


_BROADCAST_CACHE: dict[str, object] = {}


def get_broadcast(ref):
    """Worker-local cache around ``ray.get`` for broadcast objects: the
    first call in a worker process deserializes from the object store,
    subsequent calls are dict hits. Lets cheap broadcast lookups run in
    stateless TASKS (no actor-pool spin-up cost) while still fetching
    the object once per worker."""
    if isinstance(ref, (dict, list, tuple)):
        return ref
    key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
    v = _BROADCAST_CACHE.get(key)
    if v is None:
        import ray

        v = _BROADCAST_CACHE[key] = ray.get(ref)
    return v


def pool_size(requested: int) -> int:
    """Actor-pool size capped at half the cluster CPUs so map pools never
    starve shuffle aggregators / read / write tasks (a full-CPU pool
    livelocks the streaming executor on small clusters). Mirrors the
    reference's resource-based pool sizing
    (``blarify/code_references/lsp_helper.py:97-191``)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, min(requested, cpus // 2))
