"""S6 — materialize the graph: canonical entities + weighted edges as
sorted, hash-partitioned Parquet, computed in ONE fused pass.

Analog of the reference's idempotent MERGE sink
(``blarify/repositories/graph_db_manager/neo4j_manager.py:83-197``):
deterministic md5 ids (ids.py) + atomic partition replace give the same
re-run-converges property without a database. Edge rows carry the
evidence snippet of their first (url, sent_id) occurrence as
``scope_text`` (``blarify/graph/relationship/relationship.py:8-33``).

Fusion (scaling): entity and edge aggregation share their expensive
input — one corpus-scale scan of mentions_resolved produces BOTH partial
streams, which ride the SAME ``groupby(gkey)`` exchange (rows are
kind-tagged 'E'/'R'); the merged output is entity-scale and is split
into the two sorted parquet layouts afterwards. Halves the per-build
scan+shuffle count vs separate S6a/S6b stages — fixed orchestration
latency was the measured scaling-efficiency bottleneck (BASELINE.md).

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
import pyarrow.compute as pc
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..ids import entity_id, id_bucket
from ..schemas import EDGES, ENTITIES
from ..util import get_broadcast

# union row schema of the fused aggregation output (kind 'E' → entity
# columns populated, 'R' → edge columns populated)
GRAPH_ROWS = pa.schema(
    [
        ("kind", pa.string()),
        ("entity_id", pa.string()),
        ("name", pa.string()),
        ("type", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("n_mentions", pa.int64()),
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("pred", pa.string()),
        ("scope_text", pa.string()),
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("weight", pa.int64()),
        ("bucket", pa.int32()),
    ]
)

# columns of mentions_resolved the fused pass needs (pruned read)
GRAPH_INPUT_COLUMNS = [
    "url", "sent_id", "key", "etype", "resolved", "surface",
    "pred", "obj_key", "obj_type", "obj_resolved", "sent_text",
]


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


def entity_partials(batch: pd.DataFrame, canon, agg_partitions: int) -> pd.DataFrame:
    """Per-batch partial aggregation: (name, type) → n, distinct
    surfaces. Dict-loop aggregation: faster than pandas lambda-agg
    because the surface-set union has no vectorized form."""
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
    return g


def edge_partials(tri: pd.DataFrame, canon, agg_partitions: int) -> pd.DataFrame:
    """Per-batch partial aggregation of triples:
    (subj, st, pred, obj, ot) → weight, min-(url, sent_id) provenance +
    that occurrence's evidence snippet. Fully vectorized pandas groupby
    (stable sort by (url, sent_id) + first = lexicographic tuple-min)."""
    sn, st = _resolve_df(tri, "subj_key", "subj_type", "subj_resolved", canon)
    on, ot = _resolve_df(tri, "obj_key", "obj_type", "obj_resolved", canon)
    df = pd.DataFrame(
        {
            "subj": sn, "subj_type": st, "pred": tri["pred"],
            "obj": on, "obj_type": ot,
            "url": tri["url"], "sent_id": tri["sent_id"],
            "sent_text": tri["sent_text"],
        }
    )
    keys = ["subj", "subj_type", "pred", "obj", "obj_type"]
    df = df.sort_values(["url", "sent_id"], kind="mergesort")
    g = (
        df.groupby(keys, sort=True)
        .agg(
            weight=("url", "size"), url=("url", "first"),
            sent_id=("sent_id", "first"), sent_text=("sent_text", "first"),
        )
        .reset_index()
    )
    g["gkey"] = _gkey(
        g["subj"] + "\x00" + g["subj_type"] + "\x00" + g["pred"] + "\x00" + g["obj"] + "\x00" + g["obj_type"],
        agg_partitions,
    ).to_numpy()
    return g


# fixed Arrow schema for the kind-tagged partial rows riding the fused
# shuffle — typed nulls instead of pandas NaN-widening, so every block
# has the identical schema and the exchange stays zero-copy Arrow
GRAPH_PARTIALS = pa.schema(
    [
        ("kind", pa.string()),
        ("gkey", pa.int32()),
        ("name", pa.string()),
        ("type", pa.string()),
        ("n", pa.int64()),
        ("surfaces", pa.list_(pa.string())),
        ("subj", pa.string()),
        ("subj_type", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("weight", pa.int64()),
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("sent_text", pa.string()),
    ]
)

_ENT_COLS = ("name", "type", "n", "surfaces")
_EDGE_COLS = ("subj", "subj_type", "pred", "obj", "obj_type", "weight", "url", "sent_id", "sent_text")


def graph_partials(batch: pd.DataFrame, canon_ref, agg_partitions: int) -> pa.Table:
    """Fused per-batch partials: ONE pass over a mentions_resolved batch
    emits kind-tagged entity AND edge partial rows on the fixed
    GRAPH_PARTIALS Arrow schema. Stateless TASK (the only state is the
    broadcast canonical map, cached per worker)."""
    canon = get_broadcast(canon_ref)
    ent = entity_partials(batch, canon, agg_partitions)
    tri = batch[batch["pred"].notna()].rename(
        columns={"key": "subj_key", "etype": "subj_type", "resolved": "subj_resolved"}
    )
    edg = edge_partials(tri, canon, agg_partitions) if len(tri) else None
    ne = len(ent)
    nr = 0 if edg is None else len(edg)
    cols: dict[str, list] = {
        "kind": ["E"] * ne + ["R"] * nr,
        "gkey": ent["gkey"].tolist() + ([] if edg is None else edg["gkey"].tolist()),
    }
    for c in _ENT_COLS:
        cols[c] = ent[c].tolist() + [None] * nr
    for c in _EDGE_COLS:
        cols[c] = [None] * ne + ([] if edg is None else edg[c].tolist())
    return pa.Table.from_pydict(cols, schema=GRAPH_PARTIALS)


def merge_graph_partition(group: pd.DataFrame, cfg: PipelineConfig) -> pa.Table:
    """Merge one hash partition of kind-tagged partials into final
    entity/edge rows (union GRAPH_ROWS schema)."""
    n_rows = 0
    cols: dict[str, list] = {f.name: [] for f in GRAPH_ROWS}

    ge = group[group["kind"] == "E"]
    if len(ge):
        agg: dict[tuple[str, str], tuple[int, set]] = {}
        for name, typ, n, surfs in zip(ge["name"], ge["type"], ge["n"], ge["surfaces"]):
            cur = agg.get((name, typ))
            if cur is None:
                agg[(name, typ)] = (int(n), set(surfs))
            else:
                cur[1].update(surfs)
                agg[(name, typ)] = (cur[0] + int(n), cur[1])
        for name, typ in sorted(agg):
            eid = entity_id(cfg.env, typ, name)
            cols["kind"].append("E")
            cols["entity_id"].append(eid)
            cols["name"].append(name)
            cols["type"].append(typ)
            cols["aliases"].append(sorted(agg[(name, typ)][1]))
            cols["n_mentions"].append(agg[(name, typ)][0])
            cols["src_id"].append(None)
            cols["dst_id"].append(None)
            cols["pred"].append(None)
            cols["scope_text"].append(None)
            cols["url"].append(None)
            cols["sent_id"].append(None)
            cols["weight"].append(None)
            cols["bucket"].append(id_bucket(eid, cfg.num_buckets))
            n_rows += 1

    gr = group[group["kind"] == "R"]
    if len(gr):
        keys = ["subj", "subj_type", "pred", "obj", "obj_type"]
        gr = gr.sort_values(["url", "sent_id"], kind="mergesort")
        g = (
            gr.groupby(keys, sort=True)
            .agg(
                weight=("weight", "sum"), url=("url", "first"),
                sent_id=("sent_id", "first"), sent_text=("sent_text", "first"),
            )
            .reset_index()
        )
        for subj, stype, pred, obj, otype, weight, url, sent_id, sent_text in zip(
            g["subj"], g["subj_type"], g["pred"], g["obj"], g["obj_type"],
            g["weight"], g["url"], g["sent_id"], g["sent_text"],
        ):
            src = entity_id(cfg.env, stype, subj)
            cols["kind"].append("R")
            cols["entity_id"].append(None)
            cols["name"].append(None)
            cols["type"].append(None)
            cols["aliases"].append(None)
            cols["n_mentions"].append(None)
            cols["src_id"].append(src)
            cols["dst_id"].append(entity_id(cfg.env, otype, obj))
            cols["pred"].append(pred)
            cols["scope_text"].append(sent_text)
            cols["url"].append(url)
            cols["sent_id"].append(int(sent_id))
            cols["weight"].append(int(weight))
            cols["bucket"].append(id_bucket(src, cfg.num_buckets))
            n_rows += 1

    return pa.Table.from_pydict(cols, schema=GRAPH_ROWS)


def resolve_via_copartition(
    mentions_resolved: ray.data.Dataset,
    canon_ds: ray.data.Dataset,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Resolve unresolved (key, etype) columns through the canonical
    TABLE with hash-co-partitioned lookup joins instead of a broadcast
    driver dict — the open-vocabulary path (cfg.canon_broadcast_max):
    the canonical map is sharded across workers by hash(norm) and never
    materializes on one machine. Two joins (subject side, object side);
    after this every row is resolved and the fused aggregation runs with
    an empty canon map."""
    from ..ops.joins import copartition_attach

    mr = copartition_attach(
        mentions_resolved, canon_ds, "key", "norm",
        {"name": "_rn", "etype": "_rt"}, partitions=partitions, how="left",
    )
    mr = copartition_attach(
        mr, canon_ds, "obj_key", "norm",
        {"name": "_on", "etype": "_ot"}, partitions=partitions, how="left",
    )

    def patch(df: pd.DataFrame) -> pd.DataFrame:
        sub = df["resolved"].eq(False)
        df.loc[sub, "key"] = df.loc[sub, "_rn"]
        df.loc[sub, "etype"] = df.loc[sub, "_rt"]
        df.loc[sub, "resolved"] = True
        osub = df["obj_resolved"].eq(False)  # null (non-triple rows) stays null
        df.loc[osub, "obj_key"] = df.loc[osub, "_on"]
        df.loc[osub, "obj_type"] = df.loc[osub, "_ot"]
        df.loc[osub, "obj_resolved"] = True
        return df.drop(columns=["_rn", "_rt", "_on", "_ot"])

    return mr.map_batches(patch, batch_format="pandas")


def build_graph(
    mentions_resolved: ray.data.Dataset,
    canon_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """mentions_resolved → kind-tagged union dataset of final entity and
    edge rows: one scan, one shuffle, entity-scale output. Split with
    ``split_entities`` / ``split_edges``."""
    partials = mentions_resolved.map_batches(
        lambda b, _r=canon_ref, _p=cfg.agg_partitions: graph_partials(b, _r, _p),
        batch_format="pandas",
        # large partial batches: the pre-aggregation ratio depends on
        # mentions-per-batch vs vocabulary size — small batches barely
        # dedup before the shuffle and the list-typed surfaces column
        # makes every shuffled row expensive
        batch_size=65536,
    )
    return partials.groupby("gkey").map_groups(
        lambda g, _c=cfg: merge_graph_partition(g, _c), batch_format="pandas"
    )


def split_entities(graph: ray.data.Dataset) -> ray.data.Dataset:
    return graph.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "E")).select(ENTITIES.names).cast(ENTITIES),
        batch_format="pyarrow",
    )


def split_edges(graph: ray.data.Dataset) -> ray.data.Dataset:
    return graph.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "R")).select(EDGES.names).cast(EDGES),
        batch_format="pyarrow",
    )
