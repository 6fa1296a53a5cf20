"""Deterministic id scheme.

Mirrors the reference's identity invariant: a node's logical id is the
GraphEnvironment prefix + a recursive path of identifier fragments, and
the physical key is ``md5(id)``
(``blarify/graph/node/types/node.py:47-60,97-104``,
``blarify/graph/node/utils/id_calculator.py:4-16``).

Here the "path" for a canonical entity is ``/{env}/{diff}/{type}/{name}``
so ids are stable across reruns and parallelism levels.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .config import GraphEnvironment


def entity_logical_id(env: GraphEnvironment, etype: str, canonical_name: str) -> str:
    return f"{env.prefix}/{etype}/{canonical_name}"


def hashed_id(logical_id: str) -> str:
    """md5 hex digest — the physical key (node.py:47-49)."""
    return hashlib.md5(logical_id.encode("utf-8")).hexdigest()


_EID_CACHE: dict[tuple[str, str, str], str] = {}


def entity_id(env: GraphEnvironment, etype: str, canonical_name: str) -> str:
    # memoized: the distinct-entity vocabulary is orders of magnitude
    # smaller than the number of edge endpoints that ask for an id (the
    # S6 merge calls this per edge row — a hot entity's id would
    # otherwise be re-md5'd millions of times)
    k = (env.prefix, etype, canonical_name)
    v = _EID_CACHE.get(k)
    if v is None:
        if len(_EID_CACHE) > 1_000_000:  # worker-lifetime bound
            _EID_CACHE.clear()
        v = _EID_CACHE[k] = hashed_id(entity_logical_id(env, etype, canonical_name))
    return v


def id_bucket(eid_hex: str, num_buckets: int) -> int:
    """Stable hash partition bucket from the first 8 hex chars of the id."""
    return int(eid_hex[:8], 16) % num_buckets


def id_bucket_array(eids: "np.ndarray", num_buckets: int) -> "np.ndarray":
    """Vectorized bucket assignment for an array of hex-id strings."""
    return np.array([int(e[:8], 16) % num_buckets for e in eids], dtype=np.int32)


def stable_u64(s: str) -> int:
    """Deterministic 64-bit hash of a string (never Python's salted hash())."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
