"""Small runtime helpers."""

from __future__ import annotations

import ray


from collections import OrderedDict

_BROADCAST_CACHE: OrderedDict[str, object] = OrderedDict()
_BROADCAST_CACHE_MAX = 4  # bounded: repeated builds in one long-lived
# session must not pin every generation's broadcast objects in every
# worker — LRU keeps only the most recent few refs


def get_broadcast(ref):
    """Worker-local LRU cache around ``ray.get`` for broadcast objects:
    the first call in a worker process deserializes from the object
    store, subsequent calls are dict hits. Lets cheap broadcast lookups
    run in stateless TASKS (no actor-pool spin-up cost) while still
    fetching the object once per worker."""
    if isinstance(ref, (dict, list, tuple)):
        return ref
    key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
    v = _BROADCAST_CACHE.get(key)
    if v is None:
        import ray

        v = _BROADCAST_CACHE[key] = ray.get(ref)
        while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.popitem(last=False)
    else:
        _BROADCAST_CACHE.move_to_end(key)
    return v


def compact_nonempty(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Materialize ``ds`` and rebuild it as a FRESH lineage over only its
    non-empty block refs (no data copied — refs move, blocks don't).

    Two Ray 2.49 behaviors make this necessary around iterative
    hash-partitioned loops: (1) aggregate / Project operators emit
    SCHEMA-LESS empty blocks for empty partitions, and map UDFs are
    SKIPPED for 0-row inputs, so the empties survive any map-side guard
    and eventually crash the hash-shuffle aggregator's finalize sort
    ("No match for FieldRef.Name(_pkey)"); (2) a derived dataset reuses
    the DataContext captured by its ancestor, so a lineage rooted inside
    a ``hash_shuffle_scope`` drags HASH_SHUFFLE into every later groupby
    even after the scope exits. Rebuilding from refs resets both. The
    identity pyarrow map converts any pandas-formatted blocks (e.g.
    ``map_groups(batch_format="pandas")`` output) to Arrow so
    ``from_arrow_refs`` is valid."""
    mat = ds.map_batches(lambda t: t, batch_format="pyarrow").materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        return mat  # all-empty: callers handle empty datasets explicitly
    return ray.data.from_arrow_refs(refs)


def tune_data_context() -> None:
    """Execution-context tuning applied by the session OWNERS (bench,
    CLI, test fixture — never library code): hash-partitioned shuffle
    for groupby/repartition exchanges. The sort-based default pays a
    global range-partition latency that dominates entity-scale
    aggregations; hash shuffle routes blocks directly to reducers
    (measured ~25% faster on the fused S6 exchange at 800k pages)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ctx = DataContext.get_current()
    # Hash-shuffle is applied SELECTIVELY (see hash_shuffle_scope) — the
    # wide entity/edge aggregation exchange measures ~2× faster under it,
    # while scan-dominated stages do better on the sort-based default.
    # Aggregator actors must never reserve whole CPU slots: alongside an
    # actor-pool map stage on a small cluster that livelocks the
    # streaming executor (the documented pool_size gotcha, but for the
    # shuffle's own actors). Cap their count to the cluster and make
    # their CPU reservation nominal.
    ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
    ctx.default_hash_shuffle_parallelism = max(4, cpus * 2)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01


class hash_shuffle_scope:
    """Context manager: run the enclosed Dataset executions with the
    hash-partitioned shuffle strategy, restoring the previous strategy on
    exit. Used around the fused S6 exchange where it measures ~2× faster
    than the sort-based default."""

    def __enter__(self):
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        self._ctx = DataContext.get_current()
        self._old = self._ctx.shuffle_strategy
        self._ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        return self

    def __exit__(self, *exc):
        self._ctx.shuffle_strategy = self._old
        return False


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
