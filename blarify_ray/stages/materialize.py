"""S6 — materialize the graph: canonical entities + weighted edges as
sorted, hash-partitioned Parquet.

Analog of the reference's idempotent MERGE sink
(``blarify/repositories/graph_db_manager/neo4j_manager.py:83-197``):
deterministic md5 ids (ids.py) + atomic partition replace give the same
re-run-converges property without a database.

Skew handling (north_rule): both aggregations use the partial/combiner
pattern — a vectorized per-batch pre-aggregation emits ≤1 row per key
per batch, so the hot entity (~30% of pages) reaches the global shuffle
as one row per upstream batch instead of one row per mention. The final
merge groups by ``gkey = hash(key) % agg_partitions`` (partition-level
map_groups with a local dict aggregation inside) rather than one
Ray-level group per key — bounded fan-in AND bounded task count.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..ids import entity_id, id_bucket, stable_u64
from ..schemas import EDGES, ENTITIES
from ..util import get_broadcast


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


def entity_partials(batch: pa.Table, canon_ref, agg_partitions: int) -> pa.Table:
    """Per-batch partial aggregation: (name, type) → n, distinct
    surfaces. A stateless TASK (not an actor pool — the only state is
    the broadcast canonical map, cached per worker by get_broadcast)."""
    canon = get_broadcast(canon_ref)
    names, types = _resolve_arrays(
        batch["key"].to_pylist(), batch["etype"].to_pylist(), batch["resolved"].to_pylist(), canon
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
            "gkey": [stable_u64(f"{k[0]}\x00{k[1]}") % agg_partitions for k in ks],
            "name": [k[0] for k in ks],
            "type": [k[1] for k in ks],
            "n": [agg[k][0] for k in ks],
            "surfaces": [sorted(agg[k][1]) for k in ks],
        },
        schema=pa.schema(
            [("gkey", pa.int32()), ("name", pa.string()), ("type", pa.string()),
             ("n", pa.int64()), ("surfaces", pa.list_(pa.string()))]
        ),
    )


def build_entities(
    mentions_resolved: ray.data.Dataset,
    canon_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    partials = mentions_resolved.map_batches(
        lambda b, _r=canon_ref, _p=cfg.agg_partitions: entity_partials(b, _r, _p),
        batch_format="pyarrow",
        batch_size=4096,
    )

    def merge_partition(group: pa.Table) -> pa.Table:
        agg: dict[tuple[str, str], tuple[int, set]] = {}
        for name, typ, n, surfs in zip(
            group["name"].to_pylist(), group["type"].to_pylist(),
            group["n"].to_pylist(), group["surfaces"].to_pylist(),
        ):
            cur = agg.get((name, typ))
            if cur is None:
                agg[(name, typ)] = (n, set(surfs))
            else:
                cur[1].update(surfs)
                agg[(name, typ)] = (cur[0] + n, cur[1])
        ks = sorted(agg)
        eids = [entity_id(cfg.env, typ, name) for name, typ in ks]
        return pa.Table.from_pydict(
            {
                "entity_id": eids,
                "name": [k[0] for k in ks],
                "type": [k[1] for k in ks],
                "aliases": [sorted(agg[k][1]) for k in ks],
                "n_mentions": [agg[k][0] for k in ks],
                "bucket": [id_bucket(e, cfg.num_buckets) for e in eids],
            },
            schema=ENTITIES,
        )

    return partials.groupby("gkey").map_groups(merge_partition, batch_format="pyarrow")


def edge_partials(batch: pa.Table, canon_ref, agg_partitions: int) -> pa.Table:
    """Per-batch partial aggregation of triples:
    (subj, st, pred, obj, ot) → weight, min-(url, sent_id) provenance.
    Stateless task; broadcast map cached per worker."""
    canon = get_broadcast(canon_ref)
    snames, stypes = _resolve_arrays(
        batch["subj_key"].to_pylist(), batch["subj_type"].to_pylist(),
        batch["subj_resolved"].to_pylist(), canon,
    )
    onames, otypes = _resolve_arrays(
        batch["obj_key"].to_pylist(), batch["obj_type"].to_pylist(),
        batch["obj_resolved"].to_pylist(), canon,
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
            "gkey": [stable_u64("\x00".join(k)) % agg_partitions for k in ks],
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
        lambda b, _r=canon_ref, _p=cfg.agg_partitions: edge_partials(b, _r, _p),
        batch_format="pyarrow",
        batch_size=4096,
    )

    def merge_partition(group: pa.Table) -> pa.Table:
        agg: dict[tuple, tuple[int, tuple[str, int]]] = {}
        for sn, st, p, on, ot, w, url, sid in zip(
            group["subj"].to_pylist(), group["subj_type"].to_pylist(),
            group["pred"].to_pylist(), group["obj"].to_pylist(),
            group["obj_type"].to_pylist(), group["weight"].to_pylist(),
            group["url"].to_pylist(), group["sent_id"].to_pylist(),
        ):
            k = (sn, st, p, on, ot)
            prov = (url, sid)
            cur = agg.get(k)
            if cur is None:
                agg[k] = (w, prov)
            else:
                agg[k] = (cur[0] + w, min(cur[1], prov))
        ks = sorted(agg)
        srcs = [entity_id(cfg.env, k[1], k[0]) for k in ks]
        dsts = [entity_id(cfg.env, k[4], k[3]) for k in ks]
        return pa.Table.from_pydict(
            {
                "src_id": srcs,
                "dst_id": dsts,
                "pred": [k[2] for k in ks],
                "scope_text": [""] * len(ks),
                "url": [agg[k][1][0] for k in ks],
                "sent_id": [agg[k][1][1] for k in ks],
                "weight": [agg[k][0] for k in ks],
                "bucket": [id_bucket(s, cfg.num_buckets) for s in srcs],
            },
            schema=EDGES,
        )

    return partials.groupby("gkey").map_groups(merge_partition, batch_format="pyarrow")
