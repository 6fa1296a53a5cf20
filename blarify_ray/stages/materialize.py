"""S6 — materialize the graph: canonical entities + weighted edges as
sorted, hash-partitioned Parquet.

Analog of the reference's idempotent MERGE sink
(``blarify/repositories/graph_db_manager/neo4j_manager.py:83-197``):
deterministic md5 ids (ids.py) + atomic partition replace give the same
re-run-converges property without a database.

Skew handling (north_rule): both aggregations use the partial/combiner
pattern — a vectorized per-batch pre-aggregation emits ≤1 row per key
per batch, so the hot entity (~30% of pages) reaches the global
``groupby`` as one row per upstream batch instead of one row per
mention. That bounds the reduce fan-in by block count, which is the
salting effect without re-keying.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..ids import entity_id, id_bucket
from ..util import pool_size
from ..schemas import EDGES, ENTITIES


def _resolve_arrays(keys, etypes, resolveds, canon: dict):
    names, types = [], []
    for k, t, r in zip(keys, etypes, resolveds):
        if r:
            names.append(k)
            types.append(t)
        else:
            name, etype, _new = canon[k]
            names.append(name)
            types.append(etype)
    return names, types


class _CanonResolver:
    """Shared actor-side state: the broadcast canonical map, fetched once
    per worker from the object store."""

    def __init__(self, canon_ref):
        canon = ray.get(canon_ref) if not isinstance(canon_ref, dict) else canon_ref
        self.canon = canon


class EntityPartials(_CanonResolver):
    """Per-batch partial aggregation: (name, type) → n, distinct surfaces."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        names, types = _resolve_arrays(
            batch["key"].to_pylist(), batch["etype"].to_pylist(), batch["resolved"].to_pylist(), self.canon
        )
        agg: dict[tuple[str, str], tuple[int, set]] = {}
        for name, typ, surf in zip(names, types, batch["surface"].to_pylist()):
            cur = agg.get((name, typ))
            if cur is None:
                agg[(name, typ)] = (1, {surf})
            else:
                cur[1].add(surf)
                agg[(name, typ)] = (cur[0] + 1, cur[1])
        ks = sorted(agg)
        return pa.Table.from_pydict(
            {
                "name": [k[0] for k in ks],
                "type": [k[1] for k in ks],
                "n": [agg[k][0] for k in ks],
                "surfaces": [sorted(agg[k][1]) for k in ks],
            },
            schema=pa.schema(
                [("name", pa.string()), ("type", pa.string()), ("n", pa.int64()),
                 ("surfaces", pa.list_(pa.string()))]
            ),
        )


def build_entities(
    mentions_resolved: ray.data.Dataset,
    canon_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    partials = mentions_resolved.map_batches(
        EntityPartials,
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=pool_size(cfg.ner_concurrency),
        num_cpus=1,
    )

    def merge(group: pa.Table) -> pa.Table:
        name = group["name"][0].as_py()
        typ = group["type"][0].as_py()
        n = int(pc.sum(group["n"]).as_py())
        aliases = sorted({s for lst in group["surfaces"].to_pylist() for s in lst})
        eid = entity_id(cfg.env, typ, name)
        return pa.Table.from_pydict(
            {
                "entity_id": [eid],
                "name": [name],
                "type": [typ],
                "aliases": [aliases],
                "n_mentions": [n],
                "bucket": [id_bucket(eid, cfg.num_buckets)],
            },
            schema=ENTITIES,
        )

    return partials.groupby(["name", "type"]).map_groups(merge, batch_format="pyarrow")


class EdgePartials(_CanonResolver):
    """Per-batch partial aggregation of triples:
    (subj, st, pred, obj, ot) → weight, min-(url, sent_id) provenance."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        snames, stypes = _resolve_arrays(
            batch["subj_key"].to_pylist(), batch["subj_type"].to_pylist(),
            batch["subj_resolved"].to_pylist(), self.canon,
        )
        onames, otypes = _resolve_arrays(
            batch["obj_key"].to_pylist(), batch["obj_type"].to_pylist(),
            batch["obj_resolved"].to_pylist(), self.canon,
        )
        agg: dict[tuple, tuple[int, tuple[str, int]]] = {}
        for sn, st, p, on, ot, url, sid in zip(
            snames, stypes, batch["pred"].to_pylist(), onames, otypes,
            batch["url"].to_pylist(), batch["sent_id"].to_pylist(),
        ):
            k = (sn, st, p, on, ot)
            prov = (url, sid)
            cur = agg.get(k)
            if cur is None:
                agg[k] = (1, prov)
            else:
                agg[k] = (cur[0] + 1, min(cur[1], prov))
        ks = sorted(agg)
        return pa.Table.from_pydict(
            {
                "subj": [k[0] for k in ks],
                "subj_type": [k[1] for k in ks],
                "pred": [k[2] for k in ks],
                "obj": [k[3] for k in ks],
                "obj_type": [k[4] for k in ks],
                "weight": [agg[k][0] for k in ks],
                "url": [agg[k][1][0] for k in ks],
                "sent_id": [agg[k][1][1] for k in ks],
            }
        )


def build_edges(
    triples_linked: ray.data.Dataset,
    canon_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    partials = triples_linked.map_batches(
        EdgePartials,
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=pool_size(cfg.ner_concurrency),
        num_cpus=1,
    )

    def merge(group: pa.Table) -> pa.Table:
        sn = group["subj"][0].as_py()
        st = group["subj_type"][0].as_py()
        p = group["pred"][0].as_py()
        on = group["obj"][0].as_py()
        ot = group["obj_type"][0].as_py()
        weight = int(pc.sum(group["weight"]).as_py())
        prov = min(zip(group["url"].to_pylist(), group["sent_id"].to_pylist()))
        src = entity_id(cfg.env, st, sn)
        dst = entity_id(cfg.env, ot, on)
        return pa.Table.from_pydict(
            {
                "src_id": [src],
                "dst_id": [dst],
                "pred": [p],
                "scope_text": [""],
                "url": [prov[0]],
                "sent_id": [prov[1]],
                "weight": [weight],
                "bucket": [id_bucket(src, cfg.num_buckets)],
            },
            schema=EDGES,
        )

    return partials.groupby(["subj", "subj_type", "pred", "obj", "obj_type"]).map_groups(
        merge, batch_format="pyarrow"
    )
