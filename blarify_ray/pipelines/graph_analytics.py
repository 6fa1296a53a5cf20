"""Whole-graph analytics over the materialized KG — the scale-side
complement of the point queries in ``graph_queries.py``.

The reference ranks and groups its graph driver-side after loading it
from Neo4j (top-nodes / hierarchy queries,
``blarify/repositories/graph_db_manager/queries.py:1692-1849``); at
web-KG scale the graph itself is corpus-proportional, so these run as
iterative Ray Data rounds over the hash-partitioned edge/entity parquet:

- ``pagerank``: damped PageRank by power iteration. Size-tiered like
  every iterative op in this engine: below
  ``cfg.pagerank_driver_max_edges`` the edge list fits comfortably on
  the driver and the iteration is one numpy ``bincount`` per round;
  above it each round is a co-partitioned rank⋈edges lookup join plus
  one hash-routed vectorized sum — node-scale state lives in a
  partitioned dataset, never a driver dict. Both tiers implement the
  same spec (same damping, weighted out-degree split, dangling-mass
  redistribution) and agree to float-summation-order tolerance
  (forced-tier tested).
- ``weakly_connected_components``: undirected components of the KG via
  the same distributed min-label-propagation used by canonicalization
  (``stages/canonicalize.connected_components_ds`` — pointer jumping,
  O(log diameter) rounds); isolated entities keep their own id as the
  component label.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..state.manifest import read_stage
from ..util import compact_nonempty


def _edge_parts(n_edges: int, cfg: PipelineConfig) -> int:
    return max(1, min(cfg.agg_partitions, n_edges // cfg.cc_rows_per_partition + 1))


def pagerank(
    paths: dict[str, str],
    damping: float = 0.85,
    iters: int = 10,
    seeds: list[str] | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """PageRank over the directed KG multigraph → ``Dataset[(entity_id,
    rank)]`` (float64, sums to 1).

    Spec (both tiers): node universe = the entities table; a node's rank
    splits across its out-edges proportionally to edge ``weight``
    (multi-edges sum); dangling mass (nodes with zero outgoing weight)
    redistributes onto the teleport vector; ``rank' = (1-d)·t + d·(inflow
    + dangling·t)`` for ``iters`` rounds starting from ``t``.

    ``seeds=None`` → the teleport vector ``t`` is uniform (classic
    PageRank). ``seeds=[ids]`` → ``t`` is uniform over the seed set
    (PERSONALIZED PageRank — random walk with restart, the
    'related entities' ranking); the seed set is query-scale and ships
    to workers as a broadcast id array, never as a shuffle.
    """
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "weight"])
    ents = read_stage(paths["entities"], columns=["entity_id"])
    n_edges = edges.count()
    seed_set = sorted(set(seeds)) if seeds else None
    if (
        n_edges <= cfg.pagerank_driver_max_edges
        and ents.count() <= cfg.pagerank_driver_max_nodes
    ):
        return _pagerank_driver(edges, ents, damping, iters, seed_set)
    return _pagerank_distributed(edges, ents, n_edges, damping, iters, seed_set, cfg)


def _pagerank_driver(
    edges: ray.data.Dataset,
    ents: ray.data.Dataset,
    damping: float,
    iters: int,
    seeds: list[str] | None,
) -> ray.data.Dataset:
    """Driver tier: index-mapped numpy power iteration (one weighted
    ``bincount`` per round). Correct while the EDGE LIST fits on the
    driver — the same bound as the workflows driver tier."""
    ids = sorted(r["entity_id"] for r in ents.take_all())
    idx = {e: i for i, e in enumerate(ids)}
    n = len(ids)
    if n == 0:
        return ray.data.from_arrow(_pr_empty())
    er = edges.take_all()
    src = np.fromiter((idx[r["src_id"]] for r in er), dtype=np.int64, count=len(er))
    dst = np.fromiter((idx[r["dst_id"]] for r in er), dtype=np.int64, count=len(er))
    w = np.fromiter((r["weight"] for r in er), dtype=np.float64, count=len(er))
    out_w = np.bincount(src, weights=w, minlength=n)
    tele = np.zeros(n)
    if seeds is None:
        tele[:] = 1.0 / n
    else:
        si = [idx[s] for s in seeds if s in idx]
        if not si:  # no seed exists in the graph — match the distributed tier
            return ray.data.from_arrow(_pr_empty())
        tele[si] = 1.0 / len(si)
    rank = tele.copy()
    for _ in range(iters):
        rate = np.divide(rank, out_w, out=np.zeros(n), where=out_w > 0)
        inflow = np.bincount(dst, weights=w * rate[src], minlength=n)
        dangling = rank[out_w == 0].sum()
        rank = (1.0 - damping) * tele + damping * (inflow + dangling * tele)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {"entity_id": pa.array(ids, pa.string()), "rank": pa.array(rank, pa.float64())}
        )
    )


def _pagerank_distributed(
    edges: ray.data.Dataset,
    ents: ray.data.Dataset,
    n_edges: int,
    damping: float,
    iters: int,
    seeds: list[str] | None,
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    """Distributed tier. Per round: (1) dangling mass = one column sum
    over the node-scale state, (2) rank→edge rate attach by src (ONE
    co-partitioning shuffle, ``copartition_attach``), (3) per-batch
    partial inflow sums then one hash-routed vectorized merge, (4) left
    attach of inflow back onto the static node table. State is
    materialized per round (node-scale, never corpus-scale) so rounds
    don't re-execute the chain."""
    from ..ops.joins import copartition_attach

    parts = _edge_parts(n_edges, cfg)
    n = ents.count()
    if n == 0:
        return ray.data.from_arrow(_pr_empty())

    # static out-weight per node: per-batch partial, one routed merge
    def outw_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src_id", sort=False)["weight"].sum().reset_index()
        g.columns = ["entity_id", "out_w"]
        g["_pkey"] = (
            pd.util.hash_array(g["entity_id"].to_numpy(dtype=object)) % parts
        ).astype("int32")
        return g

    def outw_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("entity_id", sort=False)["out_w"].sum().reset_index()
        out["out_w"] = out["out_w"].astype("float64")
        return out

    outw = compact_nonempty(
        edges.map_batches(outw_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(outw_merge, batch_format="pandas")
    )
    # teleport column: uniform, or uniform over the (query-scale,
    # broadcast) seed set — personalized PageRank's restart vector
    if seeds is None:
        def add_tele(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(tele=np.float64(1.0 / n))
    else:
        seed_arr = pa.array(seeds, pa.string())
        n_seeds = ents.map_batches(
            lambda t: pa.Table.from_pydict(
                {"m": pc.cast(pc.is_in(t["entity_id"], value_set=seed_arr), pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("m")
        if not n_seeds:
            return ray.data.from_arrow(_pr_empty())

        def add_tele(df: pd.DataFrame) -> pd.DataFrame:
            m = df["entity_id"].isin(set(seeds)).to_numpy()
            return df.assign(tele=np.where(m, 1.0 / n_seeds, 0.0))

    nodes = copartition_attach(
        ents, outw, "entity_id", "entity_id", {"out_w": "out_w"},
        partitions=parts, how="left",
    ).map_batches(
        lambda df: df.assign(out_w=df["out_w"].fillna(0.0).astype("float64")),
        batch_format="pandas",
    ).map_batches(add_tele, batch_format="pandas").materialize()

    state = nodes.map_batches(
        lambda df: df.assign(rank=df["tele"].astype("float64")), batch_format="pandas"
    ).materialize()

    for _ in range(iters):
        dangling = (
            state.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"dr": pc.if_else(pc.equal(t["out_w"], 0.0), t["rank"], 0.0)}
                ),
                batch_format="pyarrow",
            ).sum("dr")
            or 0.0
        )
        rates = state.map_batches(
            lambda df: pd.DataFrame(
                {
                    "entity_id": df["entity_id"],
                    "rate": np.divide(
                        df["rank"].to_numpy(),
                        df["out_w"].to_numpy(),
                        out=np.zeros(len(df)),
                        where=df["out_w"].to_numpy() > 0,
                    ),
                }
            ),
            batch_format="pandas",
        )
        hits = copartition_attach(
            edges, rates, "src_id", "entity_id", {"rate": "rate"},
            partitions=parts, how="inner",
        )

        def inflow_partial(df: pd.DataFrame) -> pd.DataFrame:
            c = df["weight"].to_numpy(dtype="float64") * df["rate"].to_numpy()
            g = (
                pd.DataFrame({"entity_id": df["dst_id"], "c": c})
                .groupby("entity_id", sort=False)["c"]
                .sum()
                .reset_index()
            )
            g["_pkey"] = (
                pd.util.hash_array(g["entity_id"].to_numpy(dtype=object)) % parts
            ).astype("int32")
            return g

        def inflow_merge(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("entity_id", sort=False)["c"].sum().reset_index()

        inflow = compact_nonempty(
            hits.map_batches(inflow_partial, batch_format="pandas")
            .groupby("_pkey")
            .map_groups(inflow_merge, batch_format="pandas")
        )

        def new_rank(df: pd.DataFrame, _dg=dangling) -> pd.DataFrame:
            c = df["c"].fillna(0.0).to_numpy(dtype="float64")
            tele = df["tele"].to_numpy(dtype="float64")
            return pd.DataFrame(
                {
                    "entity_id": df["entity_id"],
                    "out_w": df["out_w"].astype("float64"),
                    "tele": tele,
                    "rank": (1.0 - damping) * tele + damping * (c + _dg * tele),
                }
            )

        state = (
            copartition_attach(
                nodes, inflow, "entity_id", "entity_id", {"c": "c"},
                partitions=parts, how="left",
            )
            .map_batches(new_rank, batch_format="pandas")
            .materialize()
        )

    return state.map_batches(
        lambda t: t.select(["entity_id", "rank"]), batch_format="pyarrow"
    )


def _pr_empty() -> pa.Table:
    return pa.Table.from_pydict(
        {"entity_id": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}
    )


def top_pagerank(
    paths: dict[str, str],
    k: int = 20,
    damping: float = 0.85,
    iters: int = 10,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Top-k entities by PageRank (tie → entity_id), with names attached
    by one co-partitioned lookup — the KG's 'most central' view, the
    mention-count ``top_entities`` ranking's link-structure sibling."""
    from ..ops.joins import copartition_attach

    pr = pagerank(paths, damping=damping, iters=iters, cfg=cfg)
    ents = read_stage(paths["entities"], columns=["entity_id", "name", "type"])
    named = copartition_attach(
        pr, ents, "entity_id", "entity_id", {"name": "name", "type": "type"},
        partitions=_edge_parts(ents.count(), cfg), how="inner",
    )
    return named.sort(["rank", "entity_id"], descending=[True, False]).limit(k)


def related_entities(
    paths: dict[str, str],
    seed_ids: list[str],
    k: int = 20,
    damping: float = 0.85,
    iters: int = 10,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Top-k entities most related to the seeds by personalized PageRank
    (random walk with restart onto the seed set), seeds themselves
    excluded — the link-structure 'similar nodes' query."""
    pr = pagerank(paths, damping=damping, iters=iters, seeds=seed_ids, cfg=cfg)
    seed_arr = pa.array(sorted(set(seed_ids)), pa.string())
    pr = pr.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t["entity_id"], value_set=seed_arr))
        ),
        batch_format="pyarrow",
    )
    from ..ops.joins import copartition_attach

    ents = read_stage(paths["entities"], columns=["entity_id", "name", "type"])
    named = copartition_attach(
        pr, ents, "entity_id", "entity_id", {"name": "name", "type": "type"},
        partitions=_edge_parts(ents.count(), cfg), how="inner",
    )
    return named.sort(["rank", "entity_id"], descending=[True, False]).limit(k)


def path_between(
    paths: dict[str, str],
    src_id: str,
    dst_id: str,
    max_depth: int = 6,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict]:
    """One shortest directed path src→dst (≤ ``max_depth`` hops) as
    ``[{src_id, pred, dst_id}]`` step rows, ``[]`` if none — the
    \"how are X and Y related\" point query.

    BFS layers run over the edge table with the same broadcast-frontier
    shape as ``k_hop`` (sorted id array + ``pc.is_in`` per round); each
    round records (child → parent, pred) ONLY for newly discovered nodes
    (node-scale at query depth, bounded by ``cfg.khop_broadcast_max`` —
    beyond it the query aborts with the partial parent map rather than
    exhausting the driver, returning []). Reconstruction walks the
    parent map backwards — no edge-table materialization at any point."""
    if src_id == dst_id:
        return []
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "pred"])
    parent: dict[str, tuple[str, str]] = {}
    frontier = {src_id}
    seen = {src_id}
    for _ in range(max_depth):
        fr_set = frozenset(frontier)

        def step(df: pd.DataFrame, _fr=fr_set) -> pd.DataFrame:
            m = df[df["src_id"].isin(_fr)]
            # per-batch prune: ONE whole (parent, pred) edge per child —
            # deterministic (pred, src) order, rows kept intact so the
            # reconstructed step is always a real edge
            m = m.sort_values(["dst_id", "pred", "src_id"], kind="mergesort")
            return m.drop_duplicates("dst_id", keep="first")[
                ["dst_id", "src_id", "pred"]
            ].reset_index(drop=True)

        rows = edges.map_batches(step, batch_format="pandas").take_all()
        nxt: dict[str, tuple[str, str]] = {}
        for r in sorted(rows, key=lambda r: (r["dst_id"], r["pred"], r["src_id"])):
            d = r["dst_id"]
            if d not in seen and d not in nxt:
                nxt[d] = (r["src_id"], r["pred"])
        if not nxt:
            return []
        parent.update(nxt)
        seen.update(nxt)
        # reconstruct BEFORE the size-cap abort: a path discovered in the
        # round that crosses the cap is still a valid result
        if dst_id in parent:
            steps = []
            cur = dst_id
            while cur != src_id:
                p, pred = parent[cur]
                steps.append({"src_id": p, "pred": pred, "dst_id": cur})
                cur = p
            return list(reversed(steps))
        if len(seen) > cfg.khop_broadcast_max:
            return []  # graph region too dense for a point query
        frontier = set(nxt)
    return []


def weakly_connected_components(
    paths: dict[str, str], cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Undirected components over the KG edges →
    ``Dataset[(entity_id, component)]`` where ``component`` is the
    minimum entity_id in the component (isolated entities label
    themselves). Runs on ``connected_components_ds`` — the same
    distributed min-label propagation (pointer jumping, hash-partitioned
    label state) that canonicalization uses, so there is exactly one CC
    implementation in the engine."""
    from ..ops.joins import copartition_attach
    from ..stages.canonicalize import connected_components_ds

    edges = read_stage(paths["edges"], columns=["src_id", "dst_id"])
    pairs = edges.map_batches(
        lambda t: pa.Table.from_pydict({"x": t["src_id"], "y": t["dst_id"]}),
        batch_format="pyarrow",
    )
    labels = connected_components_ds(pairs, cfg)  # (node, comp), edge nodes only
    ents = read_stage(paths["entities"], columns=["entity_id"])
    attached = copartition_attach(
        ents, labels, "entity_id", "node", {"comp": "component"},
        partitions=_edge_parts(edges.count(), cfg), how="left",
    )
    return attached.map_batches(
        lambda df: pd.DataFrame(
            {
                "entity_id": df["entity_id"],
                "component": df["component"].fillna(df["entity_id"]),
            }
        ),
        batch_format="pandas",
    )


def top_betweenness(
    paths: dict[str, str], k: int = 50, k_sources: int = 16,
    seed: int = 13, cfg: PipelineConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """Top-k entities by sampled betweenness centrality (Brandes over
    ``k_sources`` deterministic sources, scaled n/k — the path-flavour
    centrality next to PageRank and HyperBall harmonic). Delegates to
    the size-tiered ``ops/betweenness.betweenness_sampled`` over the KG
    as an undirected simple graph; ties → entity_id."""
    from ..ops.betweenness import betweenness_sampled

    edges = read_stage(paths["edges"], columns=["src_id", "dst_id"])
    pairs = edges.map_batches(
        lambda t: pa.Table.from_pydict({"x": t["src_id"], "y": t["dst_id"]}),
        batch_format="pyarrow",
    )
    bc = betweenness_sampled(pairs, k_sources=k_sources, seed=seed, cfg=cfg)
    out = (
        bc.map_batches(
            lambda df: df.rename(columns={"node": "entity_id"}),
            batch_format="pandas",
        )
        .sort(["bc", "entity_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pd.DataFrame(
        {"entity_id": out["entity_id"].astype(str),
         "bc": out["bc"].astype("float64")}
    )


def triangle_census(
    paths: dict[str, str], cfg: PipelineConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Exact triangle census of the KG viewed as an undirected simple
    graph → one-row DataFrame (n_edges, n_wedges, n_triangles,
    global_cc). Delegates to the size-tiered degree-oriented wedge join
    (``ops/graph.triangle_stats``); the KG's multi-edges and directions
    collapse before counting."""
    from ..ops.graph import triangle_stats

    edges = read_stage(paths["edges"], columns=["src_id", "dst_id"])
    pairs = edges.map_batches(
        lambda t: pa.Table.from_pydict({"x": t["src_id"], "y": t["dst_id"]}),
        batch_format="pyarrow",
    )
    st = triangle_stats(pairs, cfg)
    return pd.DataFrame(
        {
            "n_edges": pd.Series([st["n_edges"]], dtype="int64"),
            "n_wedges": pd.Series([st["n_wedges"]], dtype="int64"),
            "n_triangles": pd.Series([st["n_triangles"]], dtype="int64"),
            "global_cc": pd.Series([st["global_cc"]], dtype="float64"),
        }
    )


def k_core_entities(
    paths: dict[str, str], k: int = 2, cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Entities in the KG's k-core (undirected view) →
    ``Dataset[(entity_id,)]`` — the dense-neighborhood filter (which
    entities sit in richly cross-linked regions vs pendant mentions).
    Size-tiered iterative peeling (``ops/graph.k_core``)."""
    from ..ops.graph import k_core

    edges = read_stage(paths["edges"], columns=["src_id", "dst_id"])
    pairs = edges.map_batches(
        lambda t: pa.Table.from_pydict({"x": t["src_id"], "y": t["dst_id"]}),
        batch_format="pyarrow",
    )
    return k_core(pairs, k, cfg).map_batches(
        lambda t: t.rename_columns(["entity_id"]), batch_format="pyarrow"
    )


def component_sizes(
    paths: dict[str, str], k: int = 20, cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Top-k components by member count — the 'how fragmented is the
    graph' summary (one aggregate over the WCC labels)."""
    from ray.data.aggregate import Count

    return (
        weakly_connected_components(paths, cfg)
        .groupby("component")
        .aggregate(Count(alias_name="n_members"))
        .sort(["n_members", "component"], descending=[True, False])
        .limit(k)
    )


# --- label-propagation communities -------------------------------------------


def label_propagation(
    paths: dict[str, str],
    iters: int = 5,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Community detection by synchronous label propagation over the
    undirected KG multigraph → ``Dataset[(entity_id, community)]``.

    Spec (both tiers, bit-identical): every node starts labeled with its
    own entity_id; each synchronous round a node adopts the label with
    the MAXIMUM total incident edge weight among its neighbors' current
    labels (each directed edge contributes its int64 weight to both
    endpoints; multi-edges sum), ties → lexicographically smallest
    label; isolated nodes keep their own label. Runs ``iters`` rounds
    with early stop when no label changes. Fixed synchronous rounds +
    exact integer weights + a pinned tie-break make the result
    deterministic — the classic asynchronous LPA is not, which is why
    this variant is the one that can be forced-tier tested.

    Size-tiered like PageRank: below ``cfg.lpa_driver_max_edges`` /
    ``_nodes`` the round is one ``np.unique`` + ``np.lexsort`` argmax on
    the driver; above, each round is a co-partitioned label⋈edges
    attach, a (node, label)-keyed weight-sum exchange, and a vectorized
    per-partition argmax — node-scale state lives in a partitioned
    dataset, never a driver dict."""
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "weight"])
    ents = read_stage(paths["entities"], columns=["entity_id"])
    n_edges = edges.count()
    if (
        n_edges <= cfg.lpa_driver_max_edges
        and ents.count() <= cfg.lpa_driver_max_nodes
    ):
        return _lpa_driver(edges, ents, iters)
    return _lpa_distributed(edges, ents, n_edges, iters, cfg)


def _lpa_empty() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "entity_id": pa.array([], pa.string()),
            "community": pa.array([], pa.string()),
        }
    )


def _lpa_driver(
    edges: ray.data.Dataset, ents: ray.data.Dataset, iters: int
) -> ray.data.Dataset:
    """Driver tier: sorted-id index mapping (index order ≡ lexicographic
    order, so the tie-break is an integer argmin), one np.unique over
    (node, neighbor-label) vote keys + np.lexsort argmax per round."""
    ids = sorted(r["entity_id"] for r in ents.take_all())
    n = len(ids)
    if n == 0:
        return ray.data.from_arrow(_lpa_empty())
    idx = {e: i for i, e in enumerate(ids)}
    er = edges.take_all()
    src = np.fromiter((idx[r["src_id"]] for r in er), dtype=np.int64, count=len(er))
    dst = np.fromiter((idx[r["dst_id"]] for r in er), dtype=np.int64, count=len(er))
    w = np.fromiter((r["weight"] for r in er), dtype=np.int64, count=len(er))
    node = np.concatenate([src, dst])
    nbr = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)  # int-valued; exact < 2^53
    lab = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        if len(node) == 0:
            break
        key = node * n + lab[nbr]
        uk, inv = np.unique(key, return_inverse=True)
        wsum = np.bincount(inv, weights=w2)
        k_node, k_lab = uk // n, uk % n
        order = np.lexsort((k_lab, -wsum, k_node))
        k_node, k_lab = k_node[order], k_lab[order]
        first = np.ones(len(k_node), dtype=bool)
        first[1:] = k_node[1:] != k_node[:-1]
        new = lab.copy()
        new[k_node[first]] = k_lab[first]
        if np.array_equal(new, lab):
            break
        lab = new
    arr = np.asarray(ids, dtype=object)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "entity_id": pa.array(ids, pa.string()),
                "community": pa.array(arr[lab], pa.string()),
            }
        )
    )


def _lpa_distributed(
    edges: ray.data.Dataset,
    ents: ray.data.Dataset,
    n_edges: int,
    iters: int,
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    """Distributed tier. Per round: (1) neighbor labels attach onto the
    static undirected edge table by ONE co-partitioning exchange, (2)
    per-batch (node, label) weight-sum partials + one hash-routed
    vectorized merge ending in the per-node argmax (weight desc, label
    asc — exact, weights are int64), (3) winners left-attach onto the
    node-scale state; unmatched (isolated) nodes keep their label."""
    from ..ops.joins import copartition_attach

    parts = _edge_parts(n_edges, cfg)
    if ents.count() == 0:
        return ray.data.from_arrow(_lpa_empty())

    state = ents.map_batches(
        lambda df: pd.DataFrame(
            {"entity_id": df["entity_id"], "label": df["entity_id"]}
        ),
        batch_format="pandas",
    ).materialize()
    if n_edges == 0:
        return state.map_batches(
            lambda df: df.rename(columns={"label": "community"}),
            batch_format="pandas",
        )

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["src_id"], df["dst_id"]], ignore_index=True),
                "nbr": pd.concat([df["dst_id"], df["src_id"]], ignore_index=True),
                "w": np.tile(df["weight"].to_numpy(np.int64), 2),
            }
        )

    und = edges.map_batches(undirect, batch_format="pandas").materialize()

    def vote_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["node", "nbr_label"], sort=False)["w"].sum().reset_index()
        )
        g["_pkey"] = (
            pd.util.hash_array(g["node"].to_numpy(dtype=object)) % parts
        ).astype("int32")
        return g

    def vote_argmax(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["node", "nbr_label"], sort=False)["w"].sum().reset_index()
        s = s.sort_values(
            ["node", "w", "nbr_label"], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("node")
        return pd.DataFrame({"entity_id": s["node"], "new_label": s["nbr_label"]})

    for _ in range(iters):
        labeled = copartition_attach(
            und, state, "nbr", "entity_id", {"label": "nbr_label"},
            partitions=parts, how="inner",
        )
        winners = compact_nonempty(
            labeled.map_batches(vote_partial, batch_format="pandas")
            .groupby("_pkey")
            .map_groups(vote_argmax, batch_format="pandas")
        )
        new_state = (
            copartition_attach(
                state, winners, "entity_id", "entity_id",
                {"new_label": "new_label"}, partitions=parts, how="left",
            )
            .map_batches(
                lambda df: pd.DataFrame(
                    {
                        "entity_id": df["entity_id"],
                        "label": df["new_label"].fillna(df["label"]),
                        "changed": (
                            df["new_label"].notna()
                            & (df["new_label"] != df["label"])
                        ).astype(np.int64),
                    }
                ),
                batch_format="pandas",
            )
            .materialize()
        )
        changed = new_state.sum("changed") or 0
        state = new_state.map_batches(
            lambda df: df[["entity_id", "label"]], batch_format="pandas"
        ).materialize()
        if changed == 0:
            break
    return state.map_batches(
        lambda df: df.rename(columns={"label": "community"}),
        batch_format="pandas",
    )


def top_communities(
    paths: dict[str, str],
    k: int = 20,
    iters: int = 5,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Top-k communities by member count — the mesoscale sibling of
    ``component_sizes`` (WCC answers 'is it connected'; LPA answers
    'where are the dense regions inside the giant component')."""
    from ray.data.aggregate import Count

    return (
        label_propagation(paths, iters=iters, cfg=cfg)
        .groupby("community")
        .aggregate(Count(alias_name="n_members"))
        .sort(["n_members", "community"], descending=[True, False])
        .limit(k)
    )


# --- HyperBall distance analytics --------------------------------------------


def _kg_hb_inputs(
    paths: dict[str, str],
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id"])
    pairs = edges.map_batches(
        lambda t: pa.Table.from_pydict({"x": t["src_id"], "y": t["dst_id"]}),
        batch_format="pyarrow",
    )
    nodes = read_stage(paths["entities"], columns=["entity_id"]).map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    )
    return pairs, nodes


def harmonic_centrality(
    paths: dict[str, str],
    b: int = 8,
    max_rounds: int = 32,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Per-entity HyperBall distance analytics over the directed KG →
    ``Dataset[(entity_id, reach, harmonic)]``: how many entities can
    reach each entity (sketch estimate) and its harmonic centrality
    (Σ 1/d over inbound shortest paths) — the 'how referenced, how
    deeply' ranking PageRank's random-walk stationary view can't give.
    Sketch-accurate metrics (σ ≈ 1.04/√2^b per ball), never semantics."""
    from ..ops.hyperball import hyperball

    pairs, nodes = _kg_hb_inputs(paths)
    out, _ = hyperball(pairs, nodes, b=b, max_rounds=max_rounds, cfg=cfg)
    return out.map_batches(
        lambda df: df.rename(columns={"node": "entity_id"}), batch_format="pandas"
    )


def top_harmonic(
    paths: dict[str, str],
    k: int = 20,
    b: int = 8,
    max_rounds: int = 32,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Top-k entities by harmonic centrality (ties → smaller id)."""
    return (
        harmonic_centrality(paths, b=b, max_rounds=max_rounds, cfg=cfg)
        .sort(["harmonic", "entity_id"], descending=[True, False])
        .limit(k)
    )


def distance_distribution(
    paths: dict[str, str],
    b: int = 8,
    max_rounds: int = 32,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """Neighborhood function of the KG: one row per radius ``t`` with
    the estimated total reachable-pair count N(t), plus the fraction of
    N(∞) covered — the table the effective diameter reads off
    (``ops/hyperball.effective_diameter``)."""
    _, dist = hyperball_summary(paths, k=0, b=b, max_rounds=max_rounds, cfg=cfg)
    return dist


def hyperball_summary(
    paths: dict[str, str],
    k: int = 10,
    b: int = 8,
    max_rounds: int = 32,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> tuple[list[dict], pd.DataFrame]:
    """ONE HyperBall run → (top-k harmonic rows, distance-distribution
    table) — the combined view the ``get_centrality`` tool serves
    without paying for two register-propagation passes."""
    from ..ops.hyperball import hyperball

    pairs, nodes = _kg_hb_inputs(paths)
    out, rounds = hyperball(pairs, nodes, b=b, max_rounds=max_rounds, cfg=cfg)
    top = (
        out.map_batches(
            lambda df: df.rename(columns={"node": "entity_id"}),
            batch_format="pandas",
        )
        .sort(["harmonic", "entity_id"], descending=[True, False])
        .limit(k)
        .take_all()
        if k
        else []
    )
    if rounds.empty:
        return top, rounds.assign(frac=pd.Series([], dtype="float64"))
    final = float(rounds["total_reached"].iloc[-1]) or 1.0
    return top, rounds.assign(frac=rounds["total_reached"] / final)


# --- temporal mention trends -------------------------------------------------


def mention_trends(
    mentions: ray.data.Dataset,
    docs: ray.data.Dataset,
    window_us: int = 7 * 86_400_000_000,
    min_count: int = 3,
    z: float = 2.0,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Per-entity mention counts over crawl-time windows with burst
    flags → ``Dataset[(etype, key, win_start, n_mentions, is_burst)]``.

    A window is a burst when its count is ≥ ``min_count`` AND exceeds
    its entity's LEAVE-ONE-OUT baseline by ``z`` population standard
    deviations (mean/std over the entity's OTHER observed windows — a
    spike must not inflate its own baseline; single-window entities
    have no baseline and never burst). Deterministic: exact integer
    sums feed the float moments. The trending-entity view a KG
    timeline needs; spec shared by the KG wrapper ``entity_trends``.

    Scale shape: ONE url-keyed attach stamps each resolved mention with
    its page's crawl timestamp (docs are unique per url after
    latest-crawl dedup); per-batch (entity, window) count partials then
    ONE entity-keyed exchange where each entity's full series lands in
    one partition and the burst stats vectorize per group."""
    from ..ops.joins import copartition_attach
    from ..util import compact_nonempty

    m = mentions.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "url": t.filter(t["resolved"])["url"],
                "etype": t.filter(t["resolved"])["etype"],
                "key": t.filter(t["resolved"])["key"],
            }
        ),
        batch_format="pyarrow",
    )
    d = docs.map_batches(
        lambda t: pa.Table.from_pydict({"url": t["url"], "warc_ts": t["warc_ts"]}),
        batch_format="pyarrow",
    )
    stamped = copartition_attach(
        m, d, "url", "url", {"warc_ts": "ts"}, partitions=partitions, how="inner"
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df["ts"]).astype("int64").to_numpy()
        win = (ts // window_us) * window_us
        g = (
            pd.DataFrame({"etype": df["etype"], "key": df["key"], "win": win})
            .groupby(["etype", "key", "win"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["_pkey"] = (
            pd.util.hash_array((g["etype"] + "\x1f" + g["key"]).to_numpy(dtype=object))
            % partitions
        ).astype("int32")
        return g

    def burst(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby(["etype", "key", "win"], sort=False)["n"].sum().reset_index()
        )
        g = g.sort_values(["etype", "key", "win"], kind="mergesort")
        grp = g.assign(sq=g["n"].astype("int64") ** 2).groupby(
            ["etype", "key"], sort=False
        )
        m = grp["n"].transform("size").to_numpy(np.int64)
        s = grp["n"].transform("sum").to_numpy(np.int64)
        s2 = grp["sq"].transform("sum").to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        # leave-one-out moments over the entity's OTHER windows
        denom = np.maximum(m - 1, 1)
        loo_mean = (s - n) / denom
        loo_var = np.maximum((s2 - n * n) / denom - loo_mean * loo_mean, 0.0)
        loo_std = np.sqrt(loo_var)
        return pd.DataFrame(
            {
                "etype": g["etype"].astype(str),
                "key": g["key"].astype(str),
                "win_start": g["win"].to_numpy(np.int64),
                "n_mentions": n,
                "is_burst": (m > 1)
                & (n >= min_count)
                & (n > loo_mean + z * loo_std),
            }
        )

    return compact_nonempty(
        stamped.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(burst, batch_format="pandas")
    )


def entity_trends(
    paths: dict[str, str],
    window_us: int = 7 * 86_400_000_000,
    min_count: int = 3,
    z: float = 2.0,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """KG wrapper for ``mention_trends``: stamps each (etype, key)
    series row with its env-prefixed ``entity_id`` (vocabulary-scale
    memoized md5)."""
    from ..ids import entity_id

    mentions = read_stage(
        paths["mentions"], columns=["url", "etype", "key", "resolved"]
    )
    docs = read_stage(paths["docs"], columns=["url", "warc_ts"])
    out = mention_trends(
        mentions, docs, window_us=window_us, min_count=min_count, z=z,
        partitions=cfg.agg_partitions,
    )

    def add_id(df: pd.DataFrame, _env=cfg.env) -> pd.DataFrame:
        df = df.copy()
        df["entity_id"] = [
            entity_id(_env, et, k) for et, k in zip(df["etype"], df["key"])
        ]
        return df

    return out.map_batches(add_id, batch_format="pandas")


# --- deterministic random-walk corpus ----------------------------------------

_RW_SEP = "\x1e"


def _rw_choice_hash(starts, wnos, step: int, curs) -> np.ndarray:
    """Deterministic per-row choice hash — shared by both tiers so the
    walks are bit-identical regardless of execution shape."""
    key = (
        pd.Series(starts, dtype=object)
        + "|" + pd.Series(wnos).astype(str).to_numpy(dtype=object)
        + "|" + str(step)
        + "|" + pd.Series(curs, dtype=object)
    )
    return pd.util.hash_array(key.to_numpy(dtype=object))


def random_walks(
    paths: dict[str, str],
    walk_len: int = 8,
    walks_per_node: int = 2,
    weighted: bool = False,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """DeepWalk/node2vec-style training corpus: ``walks_per_node``
    deterministic walks from EVERY entity over the directed KG →
    ``Dataset[(start_id, walk_no, step, node_id)]`` (step 0 = start;
    walks stop early at dead ends).

    Spec (both tiers, bit-identical): successors of a node are its
    DISTINCT out-neighbors in lexicographic order; the hop taken at
    step ``t`` is ``hash(start|walk_no|t|cur) % deg(cur)`` with the
    engine's fixed-key routing hash — pseudo-uniform, reproducible
    across runs, tiers and parallelism, and requiring no RNG state.
    ``weighted=True`` draws the hop proportionally to summed int64 edge
    weights instead: ``r = hash % W(cur)`` lands in the successor whose
    cumulative-weight interval contains it (exact integer math, same
    determinism) — weight-biased walks are what node2vec embeds on a
    weighted KG.

    Size-tiered on ``cfg.workflows_driver_max_edges``: below, the
    flattened adjacency (values + offsets) lives on the driver and each
    round is one vectorized gather; above, each round attaches the
    encoded successor list with ONE co-partitioned lookup join and the
    gather runs per batch over Arrow list offsets — walk-state rows
    (n·walks_per_node) are the only iterating dataset, step rows emit
    incrementally (never a trail column)."""
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "weight"])
    ents = read_stage(paths["entities"], columns=["entity_id"])
    if edges.count() <= cfg.workflows_driver_max_edges:
        return _rw_driver(edges, ents, walk_len, walks_per_node, weighted)
    return _rw_distributed(edges, ents, walk_len, walks_per_node, weighted, cfg)


def _rw_empty() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "start_id": pa.array([], pa.string()),
            "walk_no": pa.array([], pa.int32()),
            "step": pa.array([], pa.int32()),
            "node_id": pa.array([], pa.string()),
        }
    )


def _rw_table(starts, wnos, steps, nodes) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "start_id": pa.array(list(starts), pa.string()),
            "walk_no": pa.array(np.asarray(wnos, np.int32)),
            "step": pa.array(np.asarray(steps, np.int32)),
            "node_id": pa.array(list(nodes), pa.string()),
        }
    )


def _rw_driver(
    edges: ray.data.Dataset, ents: ray.data.Dataset, walk_len: int, wpn: int,
    weighted: bool,
) -> ray.data.Dataset:
    ids = np.array(sorted(r["entity_id"] for r in ents.take_all()), dtype=object)
    if len(ids) == 0:
        return ray.data.from_arrow(_rw_empty())
    er = edges.take_all()
    if er:
        dfp = (
            pd.DataFrame(
                {
                    "s": [r["src_id"] for r in er],
                    "d": [r["dst_id"] for r in er],
                    "w": [r["weight"] for r in er],
                }
            )
            .groupby(["s", "d"], sort=True)["w"]
            .sum()
            .reset_index()
        )
        srcs = dfp["s"].to_numpy(dtype=object)
        dsts = dfp["d"].to_numpy(dtype=object)
        wts = dfp["w"].to_numpy(np.int64) if weighted else np.ones(len(dfp), np.int64)
    else:
        srcs = np.empty(0, object)
        dsts = np.empty(0, object)
        wts = np.empty(0, np.int64)
    gcw = np.cumsum(wts)
    gcw0 = np.r_[0, gcw]
    # flattened adjacency: distinct (src, dst) sorted → values + offsets
    uniq_src, counts = np.unique(srcs, return_counts=True)
    offsets = np.r_[0, np.cumsum(counts)]
    tables = []
    starts = np.repeat(ids, wpn)
    wnos = np.tile(np.arange(wpn, dtype=np.int32), len(ids))
    curs = starts.copy()
    tables.append(_rw_table(starts, wnos, np.zeros(len(starts), np.int32), curs))
    for t in range(1, walk_len + 1):
        if len(curs) == 0:
            break
        pos = np.searchsorted(uniq_src, curs)
        pos_c = np.clip(pos, 0, max(len(uniq_src) - 1, 0))
        alive = (
            (len(uniq_src) > 0)
            & (pos < len(uniq_src))
            & (uniq_src[pos_c] == curs)
        ) if len(uniq_src) else np.zeros(len(curs), bool)
        starts, wnos, curs, pos = starts[alive], wnos[alive], curs[alive], pos[alive]
        if len(curs) == 0:
            break
        base = gcw0[offsets[pos]]
        tw = gcw0[offsets[pos + 1]] - base
        r = (_rw_choice_hash(starts, wnos, t, curs) % tw.astype(np.uint64)).astype(
            np.int64
        )
        curs = dsts[np.searchsorted(gcw, base + r, side="right")]
        tables.append(_rw_table(starts, wnos, np.full(len(curs), t, np.int32), curs))
    return ray.data.from_arrow(pa.concat_tables(tables))


def _rw_distributed(
    edges: ray.data.Dataset,
    ents: ray.data.Dataset,
    walk_len: int,
    wpn: int,
    weighted: bool,
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    from ..ops.joins import copartition_attach

    parts = _edge_parts(edges.count(), cfg)

    def adj_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["src_id", "dst_id"], sort=False)["weight"].sum().reset_index()
        )
        g["_pkey"] = (
            pd.util.hash_array(g["src_id"].to_numpy(dtype=object)) % parts
        ).astype("int32")
        return g

    def adj_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby(["src_id", "dst_id"], sort=False)["weight"]
            .sum()
            .reset_index()
            .sort_values(["src_id", "dst_id"], kind="mergesort")
        )
        w = g["weight"].to_numpy(np.int64) if weighted else np.ones(len(g), np.int64)
        gg = g.assign(w=w).groupby("src_id", sort=True)
        enc = gg["dst_id"].agg(_RW_SEP.join)
        encw = gg["w"].agg(lambda v: _RW_SEP.join(map(str, v)))
        return pd.DataFrame(
            {"src": enc.index.to_numpy(), "succ": enc.to_numpy(), "ws": encw.to_numpy()}
        )

    adj = compact_nonempty(
        edges.map_batches(adj_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(adj_merge, batch_format="pandas")
    )

    def init_state(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["entity_id"].to_numpy(dtype=object)
        return pd.DataFrame(
            {
                "start_id": np.repeat(ids, wpn),
                "walk_no": np.tile(np.arange(wpn, dtype=np.int32), len(ids)),
                "cur": np.repeat(ids, wpn),
            }
        )

    state = ents.map_batches(init_state, batch_format="pandas").materialize()
    emitted = [
        state.map_batches(
            lambda df: pd.DataFrame(
                {
                    "start_id": df["start_id"],
                    "walk_no": df["walk_no"].astype("int32"),
                    "step": np.zeros(len(df), np.int32),
                    "node_id": df["cur"],
                }
            ),
            batch_format="pandas",
        )
    ]
    for t in range(1, walk_len + 1):
        if state.count() == 0:
            break
        hits = compact_nonempty(
            copartition_attach(
                state, adj, "cur", "src", {"succ": "succ", "ws": "ws"},
                partitions=parts, how="inner",
            )
        )
        if hits.count() == 0:
            break

        def hop(df: pd.DataFrame, _t=t) -> pd.DataFrame:
            succ = pa.array(df["succ"].to_numpy(dtype=object), pa.string())
            lists = pc.split_pattern(succ, _RW_SEP)
            offs = np.asarray(lists.offsets, np.int64)
            vals = np.asarray(lists.values.to_pandas(), dtype=object)
            wlists = pc.split_pattern(
                pa.array(df["ws"].to_numpy(dtype=object), pa.string()), _RW_SEP
            )
            w_flat = np.asarray(wlists.values.to_pandas(), dtype=np.int64)
            gcw = np.cumsum(w_flat)
            gcw0 = np.r_[0, gcw]
            base = gcw0[offs[:-1]]
            tw = gcw0[offs[1:]] - base
            r = (
                _rw_choice_hash(
                    df["start_id"].to_numpy(dtype=object),
                    df["walk_no"].to_numpy(),
                    _t,
                    df["cur"].to_numpy(dtype=object),
                )
                % tw.astype(np.uint64)
            ).astype(np.int64)
            nxt = vals[np.searchsorted(gcw, base + r, side="right")]
            return pd.DataFrame(
                {
                    "start_id": df["start_id"],
                    "walk_no": df["walk_no"].astype("int32"),
                    "cur": nxt,
                }
            )

        state = compact_nonempty(
            hits.map_batches(hop, batch_format="pandas")
        ).materialize()
        emitted.append(
            state.map_batches(
                lambda df, _t=t: pd.DataFrame(
                    {
                        "start_id": df["start_id"],
                        "walk_no": df["walk_no"].astype("int32"),
                        "step": np.full(len(df), _t, np.int32),
                        "node_id": df["cur"],
                    }
                ),
                batch_format="pandas",
            )
        )
    out = emitted[0]
    for e in emitted[1:]:
        out = out.union(e)
    return out


# --- strongly connected components -------------------------------------------


def strongly_connected_components(
    paths: dict[str, str], cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """SCCs of the directed KG → ``Dataset[(entity_id, scc)]`` (scc =
    min member id). WCC says "these entities touch"; SCC says "these
    entities sit on directed cycles of references" — the circular-
    dependency view. Delegates to the size-tiered
    ``ops/graph.scc`` (driver Tarjan / distributed forward-backward
    pivot refinement)."""
    from ..ops.graph import scc

    edges = read_stage(paths["edges"], columns=["src_id", "dst_id"])
    pairs = edges.map_batches(
        lambda t: pa.Table.from_pydict({"x": t["src_id"], "y": t["dst_id"]}),
        batch_format="pyarrow",
    )
    ents = read_stage(paths["entities"], columns=["entity_id"]).map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    )
    return scc(pairs, ents, cfg).map_batches(
        lambda df: df.rename(columns={"node": "entity_id"}), batch_format="pandas"
    )


def scc_sizes(
    paths: dict[str, str], k: int = 20, cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Top-k SCCs by member count (ties → smaller component id) — every
    row with ``n_members >= 2`` is a directed reference cycle."""
    from ray.data.aggregate import Count

    return (
        strongly_connected_components(paths, cfg)
        .groupby("scc")
        .aggregate(Count(alias_name="n_members"))
        .sort(["n_members", "scc"], descending=[True, False])
        .limit(k)
    )


# --- strongest (bottleneck) path ---------------------------------------------


def strongest_path(
    paths: dict[str, str],
    src_id: str,
    dst_id: str,
    max_rounds: int = 12,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """WIDEST (bottleneck) path from ``src_id`` to ``dst_id``: the path
    maximizing the MINIMUM edge weight along it (ties → fewer hops, then
    lexicographically smallest parent chain) →
    ``{"bottleneck": int, "hops": int, "steps": [{src_id, dst_id,
    weight}, ...]}`` or ``{"bottleneck": 0, "hops": 0, "steps": []}``
    when unreachable within ``max_rounds`` hops.

    ``path_between`` answers "are they connected" (fewest hops); this
    answers "how STRONGLY are they connected" — the evidence-backed
    relatedness chain (edge weight = co-mention count). All state is
    integer (bottleneck, hops, parent), so the comparison
    ``(-bottleneck, hops, parent)`` is a total order and both tiers are
    bit-identical by construction.

    Size-tiered on ``cfg.workflows_driver_max_edges``: below, a
    max-bottleneck Dijkstra on the driver; above, synchronous
    label-correcting rounds — per round ONE co-partitioned state⋈edges
    attach emits relax candidates, one node-keyed exchange keeps each
    node's lexicographic best, a left-attach folds it into the state
    (node-scale, never corpus-scale), early-stopping when no label
    improves. Path reconstruction walks parents backward — ≤ hops
    point filters on the final node-scale state."""
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "weight"])
    if edges.count() <= cfg.workflows_driver_max_edges:
        return _strongest_driver(edges, src_id, dst_id, max_rounds)
    return _strongest_distributed(edges, src_id, dst_id, max_rounds, cfg)


def _sp_result(parent: dict, weight_to: dict, bneck: dict, src_id: str, dst_id: str) -> dict:
    if dst_id not in parent and dst_id != src_id:
        return {"bottleneck": 0, "hops": 0, "steps": []}
    steps = []
    cur = dst_id
    while cur != src_id:
        p = parent[cur]
        steps.append({"src_id": p, "dst_id": cur, "weight": int(weight_to[cur])})
        cur = p
    steps.reverse()
    return {
        "bottleneck": int(bneck.get(dst_id, 0)) if steps else 0,
        "hops": len(steps),
        "steps": steps,
    }


def _strongest_driver(
    edges: ray.data.Dataset, src_id: str, dst_id: str, max_rounds: int
) -> dict:
    """Driver tier: synchronous rounds over an adjacency dict — the SAME
    label-correcting spec as the distributed tier (not heap Dijkstra:
    identical round semantics make the tiers trivially comparable)."""
    adj: dict = {}
    for r in edges.take_all():
        # multigraph: keep the max weight per (src, dst)
        key = (r["src_id"], r["dst_id"])
        w = int(r["weight"])
        if adj.setdefault(r["src_id"], {}).get(r["dst_id"], 0) < w:
            adj[r["src_id"]][r["dst_id"]] = w
    INF = 1 << 62
    state: dict = {src_id: (-INF, 0, "")}  # node → (-bneck, hops, parent)
    for _ in range(max_rounds):
        cand: dict = {}
        for node, (nb, hops, _p) in state.items():
            for dst, w in adj.get(node, {}).items():
                lab = (max(nb, -w), hops + 1, node)
                if dst not in cand or lab < cand[dst]:
                    cand[dst] = lab
        changed = False
        for dst, lab in cand.items():
            if dst not in state or lab < state[dst]:
                state[dst] = lab
                changed = True
        if not changed:
            break
    parent = {n: p for n, (_b, _h, p) in state.items() if n != src_id}
    bneck = {n: -b for n, (b, _h, _p) in state.items()}
    weight_to = {
        n: adj.get(p, {}).get(n, 0) for n, p in parent.items()
    }
    # step weights are the actual edge weights; recompute exactly
    return _sp_result(parent, weight_to, bneck, src_id, dst_id)


def _strongest_distributed(
    edges: ray.data.Dataset, src_id: str, dst_id: str, max_rounds: int,
    cfg: PipelineConfig,
) -> dict:
    from ..ops.joins import copartition_attach

    parts = _edge_parts(edges.count(), cfg)
    # dedup multi-edges to max weight per (src, dst): one src-keyed exchange
    def dd_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["src_id", "dst_id"], sort=False)["weight"].max().reset_index()
        )
        g["_pkey"] = (
            pd.util.hash_array(g["src_id"].to_numpy(dtype=object)) % parts
        ).astype("int32")
        return g

    e = compact_nonempty(
        edges.map_batches(dd_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g.groupby(["src_id", "dst_id"], sort=False)["weight"]
            .max()
            .reset_index(),
            batch_format="pandas",
        )
    ).materialize()
    INF = np.int64(1 << 62)
    state = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "node": pa.array([src_id], pa.string()),
                "nb": pa.array([-INF]),  # negated bottleneck
                "hops": pa.array([np.int64(0)]),
                "parent": pa.array([""], pa.string()),
            }
        )
    ).materialize()
    for _ in range(max_rounds):
        hits = compact_nonempty(
            copartition_attach(
                e, state, "src_id", "node", {"nb": "nb", "hops": "hops"},
                partitions=parts, how="inner",
            )
        )
        if hits.count() == 0:
            break

        def relax_partial(df: pd.DataFrame) -> pd.DataFrame:
            nb = np.maximum(df["nb"].to_numpy(np.int64), -df["weight"].to_numpy(np.int64))
            out = pd.DataFrame(
                {
                    "node": df["dst_id"],
                    "nb": nb,
                    "hops": df["hops"].to_numpy(np.int64) + 1,
                    "parent": df["src_id"],
                }
            )
            out = out.sort_values(["node", "nb", "hops", "parent"], kind="mergesort")
            out = out.drop_duplicates("node", keep="first")
            out["_pkey"] = (
                pd.util.hash_array(out["node"].to_numpy(dtype=object)) % parts
            ).astype("int32")
            return out

        cand = compact_nonempty(
            hits.map_batches(relax_partial, batch_format="pandas")
            .groupby("_pkey")
            .map_groups(
                lambda g: g.sort_values(
                    ["node", "nb", "hops", "parent"], kind="mergesort"
                ).drop_duplicates("node", keep="first")[
                    ["node", "nb", "hops", "parent"]
                ],
                batch_format="pandas",
            )
        )

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            has = df["c_nb"].notna().to_numpy()
            nb = df["nb"].to_numpy(np.int64)
            hops = df["hops"].to_numpy(np.int64)
            parent = df["parent"].to_numpy(dtype=object)
            c_nb = df["c_nb"].fillna(INF).to_numpy(np.int64)
            c_hops = df["c_hops"].fillna(0).to_numpy(np.int64)
            c_parent = df["c_parent"].fillna("").to_numpy(dtype=object)
            # vectorized lexicographic (nb, hops, parent) strict-less
            take = has & (
                (c_nb < nb)
                | ((c_nb == nb) & (c_hops < hops))
                | ((c_nb == nb) & (c_hops == hops) & (c_parent < parent))
            )
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "nb": np.where(take, c_nb, nb),
                    "hops": np.where(take, c_hops, hops),
                    "parent": np.where(take, c_parent, parent),
                    "changed": take.astype(np.int8),
                }
            )

        merged = copartition_attach(
            state, cand, "node", "node",
            {"nb": "c_nb", "hops": "c_hops", "parent": "c_parent"},
            partitions=parts, how="left",
        ).map_batches(fold, batch_format="pandas")
        # brand-new nodes: candidates with no existing state row
        fresh = compact_nonempty(
            copartition_attach(
                cand, state, "node", "node", {"nb": "_old"},
                partitions=parts, how="left",
            ).map_batches(
                lambda df: df[df["_old"].isna()][["node", "nb", "hops", "parent"]]
                .assign(changed=np.int8(1)),
                batch_format="pandas",
            )
        )
        state = compact_nonempty(merged.union(fresh)).materialize()
        if not (state.sum("changed") or 0):
            break
        state = state.map_batches(
            lambda df: df[["node", "nb", "hops", "parent"]], batch_format="pandas"
        ).materialize()

    rows = {
        r["node"]: r
        for r in state.map_batches(
            lambda df: df[["node", "nb", "hops", "parent"]], batch_format="pandas"
        ).take_all()
    }
    parent = {n: r["parent"] for n, r in rows.items() if n != src_id}
    bneck = {n: -r["nb"] for n, r in rows.items()}
    # step weights: walk parents, fetching each edge's (deduped) weight
    if dst_id not in rows and dst_id != src_id:
        return {"bottleneck": 0, "hops": 0, "steps": []}
    weight_to: dict = {}
    cur = dst_id
    hop_edges = []
    while cur != src_id:
        p = parent[cur]
        hop_edges.append((p, cur))
        cur = p
    if hop_edges:
        import pyarrow.compute as _pc

        srcs = pa.array([a for a, _ in hop_edges], pa.string())
        dsts = pa.array([b for _, b in hop_edges], pa.string())
        hits2 = e.map_batches(
            lambda t: t.filter(
                _pc.and_(
                    _pc.is_in(t["src_id"], value_set=srcs),
                    _pc.is_in(t["dst_id"], value_set=dsts),
                )
            ),
            batch_format="pyarrow",
        ).take_all()
        wmap = {(r["src_id"], r["dst_id"]): int(r["weight"]) for r in hits2}
        weight_to = {b: wmap[(a, b)] for a, b in hop_edges}
    return _sp_result(parent, weight_to, bneck, src_id, dst_id)
