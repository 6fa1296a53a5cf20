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
map_groups with a pandas groupby inside) rather than one Ray-level group
per key — bounded fan-in AND bounded task count, no per-key Python.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..ids import entity_id, id_bucket
from ..schemas import EDGES, ENTITIES
from ..util import get_broadcast


def _resolve_df(df: pd.DataFrame, kc: str, tc: str, rc: str, canon: dict):
    """Resolve (key, type) columns through the canonical map for
    unresolved rows. The unresolved fraction is small, so the python
    lookup only touches those rows."""
    names = df[kc].copy()
    types = df[tc].copy()
    unres = ~df[rc].to_numpy(dtype=bool)
    if unres.any():
        sub = df.loc[unres, kc]
        names.loc[unres] = [canon[k][0] for k in sub]
        types.loc[unres] = [canon[k][1] for k in sub]
    return names, types


def _gkey(joined: pd.Series, parts: int) -> pd.Series:
    # pd.util.hash_array with the fixed default key — deterministic, only
    # used for partition routing (never observable in output)
    return pd.Series(pd.util.hash_array(joined.to_numpy(dtype=object)) % parts).astype("int32")


def entity_partials(batch: pd.DataFrame, canon_ref, agg_partitions: int) -> pd.DataFrame:
    """Per-batch partial aggregation: (name, type) → n, distinct
    surfaces. A stateless TASK (not an actor pool — the only state is
    the broadcast canonical map, cached per worker by get_broadcast).
    Dict-loop aggregation: faster than pandas lambda-agg because the
    surface-set union has no vectorized form."""
    canon = get_broadcast(canon_ref)
    names, types = _resolve_df(batch, "key", "etype", "resolved", canon)
    agg: dict[tuple[str, str], tuple[int, set]] = {}
    for name, typ, surf in zip(names, types, batch["surface"]):
        cur = agg.get((name, typ))
        if cur is None:
            agg[(name, typ)] = (1, {surf})
        else:
            cur[1].add(surf)
            agg[(name, typ)] = (cur[0] + 1, cur[1])
    ks = sorted(agg)
    g = pd.DataFrame(
        {
            "name": [k[0] for k in ks],
            "type": [k[1] for k in ks],
            "n": [agg[k][0] for k in ks],
            "surfaces": [sorted(agg[k][1]) for k in ks],
        }
    )
    g["gkey"] = _gkey(g["name"] + "\x00" + g["type"], agg_partitions).to_numpy()
    return g[["gkey", "name", "type", "n", "surfaces"]]


def build_entities(
    mentions_resolved: ray.data.Dataset,
    canon_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    partials = mentions_resolved.map_batches(
        lambda b, _r=canon_ref, _p=cfg.agg_partitions: entity_partials(b, _r, _p),
        batch_format="pandas",
        # large partial batches: the pre-aggregation ratio depends on
        # mentions-per-batch vs vocabulary size — small batches barely
        # dedup before the shuffle and the list-typed surfaces column
        # makes every shuffled row expensive
        batch_size=65536,
    )

    def merge_partition(group: pd.DataFrame) -> pa.Table:
        agg: dict[tuple[str, str], tuple[int, set]] = {}
        for name, typ, n, surfs in zip(
            group["name"], group["type"], group["n"], group["surfaces"]
        ):
            cur = agg.get((name, typ))
            if cur is None:
                agg[(name, typ)] = (int(n), set(surfs))
            else:
                cur[1].update(surfs)
                agg[(name, typ)] = (cur[0] + int(n), cur[1])
        ks = sorted(agg)
        eids = [entity_id(cfg.env, t, n) for n, t in ks]
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

    return partials.groupby("gkey").map_groups(merge_partition, batch_format="pandas")


def edge_partials(batch: pd.DataFrame, canon_ref, agg_partitions: int) -> pd.DataFrame:
    """Per-batch partial aggregation of triples:
    (subj, st, pred, obj, ot) → weight, min-(url, sent_id) provenance.
    Stateless task; fully vectorized pandas groupby (stable sort by
    (url, sent_id) + first = lexicographic tuple-min)."""
    canon = get_broadcast(canon_ref)
    sn, st = _resolve_df(batch, "subj_key", "subj_type", "subj_resolved", canon)
    on, ot = _resolve_df(batch, "obj_key", "obj_type", "obj_resolved", canon)
    df = pd.DataFrame(
        {
            "subj": sn, "subj_type": st, "pred": batch["pred"],
            "obj": on, "obj_type": ot,
            "url": batch["url"], "sent_id": batch["sent_id"],
        }
    )
    keys = ["subj", "subj_type", "pred", "obj", "obj_type"]
    df = df.sort_values(["url", "sent_id"], kind="mergesort")
    g = (
        df.groupby(keys, sort=True)
        .agg(weight=("url", "size"), url=("url", "first"), sent_id=("sent_id", "first"))
        .reset_index()
    )
    g["gkey"] = _gkey(
        g["subj"] + "\x00" + g["subj_type"] + "\x00" + g["pred"] + "\x00" + g["obj"] + "\x00" + g["obj_type"],
        agg_partitions,
    ).to_numpy()
    return g


def build_edges(
    triples_linked: ray.data.Dataset,
    canon_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    partials = triples_linked.map_batches(
        lambda b, _r=canon_ref, _p=cfg.agg_partitions: edge_partials(b, _r, _p),
        batch_format="pandas",
        # large partial batches: the pre-aggregation ratio depends on
        # mentions-per-batch vs vocabulary size — small batches barely
        # dedup before the shuffle and the list-typed surfaces column
        # makes every shuffled row expensive
        batch_size=65536,
    )

    def merge_partition(group: pd.DataFrame) -> pa.Table:
        keys = ["subj", "subj_type", "pred", "obj", "obj_type"]
        group = group.sort_values(["url", "sent_id"], kind="mergesort")
        g = (
            group.groupby(keys, sort=True)
            .agg(weight=("weight", "sum"), url=("url", "first"), sent_id=("sent_id", "first"))
            .reset_index()
        )
        srcs = [entity_id(cfg.env, t, n) for n, t in zip(g["subj"], g["subj_type"])]
        dsts = [entity_id(cfg.env, t, n) for n, t in zip(g["obj"], g["obj_type"])]
        return pa.Table.from_pydict(
            {
                "src_id": srcs,
                "dst_id": dsts,
                "pred": g["pred"].tolist(),
                "scope_text": [""] * len(g),
                "url": g["url"].tolist(),
                "sent_id": g["sent_id"].astype("int32").tolist(),
                "weight": g["weight"].astype("int64").tolist(),
                "bucket": [id_bucket(s, cfg.num_buckets) for s in srcs],
            },
            schema=EDGES,
        )

    return partials.groupby("gkey").map_groups(merge_partition, batch_format="pandas")
