"""Distributed graph algorithms over plain edge-pair datasets.

The KG-side whole-graph family (``pipelines/graph_analytics.py`` —
PageRank, WCC) ranks and partitions nodes; this module adds the
STRUCTURE statistics a web-scale graph pipeline needs: exact triangle
counting (the global-clustering / transitivity building block) and
k-core extraction (the dense-subgraph filter). The reference computes
its graph statistics driver-side after loading the whole graph from
Neo4j (``blarify/repositories/graph_db_manager/queries.py:1692-1849``);
here both algorithms are size-tiered the engine's usual way:

- **Driver tier** (≤ ``cfg.graph_driver_max_edges`` deduplicated
  undirected edges): vectorized pandas/numpy on the driver. The wedge
  self-merge is bucketed by source node so peak memory is one bucket's
  wedges, never the full wedge set.
- **Distributed tier**: the same plan as co-partitioned exchanges —
  degree table via per-batch partials + one node-keyed merge, edge
  orientation by (degree, id) via two ``copartition_attach`` lookups,
  wedge emission per source-routed partition (one vectorized self-merge
  per hash partition, NOT per node), and wedge↔edge closure matching on
  a composite key through one more co-partitioning. Raw node ids are
  the only payload that moves; every exchange is edge- or wedge-scale.

Triangle counting uses degree orientation (each undirected edge points
from its lower-(degree, id) endpoint), which bounds out-degrees by
O(√m) on arboricity-bounded graphs — the standard guarantee that the
wedge set stays near-linear on web-like graphs. A deliberately skewed
clique-heavy graph still emits its true wedge count (exactness is kept;
there is no sampling knob), so the partitioning assumption is: wedges
of one hash partition fit in a worker's heap.

Both tiers produce identical results (forced-tier tested); triangles
are each counted exactly once (at their lowest-ordered vertex).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..util import compact_nonempty

#: number of source-hash buckets the DRIVER tier loops over so the wedge
#: self-merge materializes one bucket at a time (bounded peak memory).
_DRIVER_WEDGE_BUCKETS = 16


def _hash_vals(vals: np.ndarray) -> np.ndarray:
    """Stable uint64 hash for int or string node-id arrays."""
    if vals.dtype.kind not in ("i", "u"):
        vals = vals.astype(object)
    return pd.util.hash_array(vals)


def _parts_for(n_edges: int, cfg: PipelineConfig) -> int:
    return max(1, min(cfg.agg_partitions, n_edges // cfg.cc_rows_per_partition + 1))


def canonical_edges(
    pairs: ray.data.Dataset, parts: int
) -> ray.data.Dataset:
    """Undirected simple edges from a directed/multi pair dataset with
    columns ``x, y``: orient each pair (min, max), drop self-loops, and
    deduplicate with one pair-keyed exchange (per-batch local dedup
    first, so a hot multi-edge reaches the shuffle once per batch)."""

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy()
        y = df["y"].to_numpy()
        swap = y < x
        lo = np.where(swap, y, x)
        hi = np.where(swap, x, y)
        out = pd.DataFrame({"x": lo, "y": hi})
        out = out[out["x"] != out["y"]].drop_duplicates()
        out["_pkey"] = (
            (_hash_vals(out["x"].to_numpy()) * np.uint64(31)
             + _hash_vals(out["y"].to_numpy())) % parts
        ).astype("int32")
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["x", "y"])[["x", "y"]]

    return compact_nonempty(
        pairs.map_batches(canon, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(dedup, batch_format="pandas")
    )


def _degrees(edges: ray.data.Dataset, parts: int) -> ray.data.Dataset:
    """(node, d) degree table: per-batch partial counts over both
    endpoints, one node-keyed vectorized merge."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["x"], df["y"]], ignore_index=True)
        g = nodes.value_counts().reset_index()
        g.columns = ["node", "d"]
        g["_pkey"] = (_hash_vals(g["node"].to_numpy()) % parts).astype("int32")
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False)["d"].sum().reset_index()
        out["d"] = out["d"].astype("int64")
        return out

    return compact_nonempty(
        edges.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def _orient(df: pd.DataFrame) -> pd.DataFrame:
    """Point each edge from its lower-(degree, id) endpoint; keep the
    destination's ordering key (ddst) for wedge-pair ordering."""
    dx = df["dx"].to_numpy(np.int64)
    dy = df["dy"].to_numpy(np.int64)
    x = df["x"].to_numpy()
    y = df["y"].to_numpy()
    flip = (dy < dx) | ((dy == dx) & (y < x))
    return pd.DataFrame(
        {
            "src": np.where(flip, y, x),
            "dst": np.where(flip, x, y),
            "ddst": np.where(flip, dx, dy).astype("int64"),
        }
    )


def _emit_wedges(g: pd.DataFrame) -> pd.DataFrame:
    """All out-neighbor pairs per source node in one vectorized
    self-merge: wedge (a, b) with ord(a) < ord(b) keyed by its CLOSURE
    edge (a, b); ``nw`` = wedges sharing that closure key (multiple
    apexes collapse to one row before the matching exchange)."""
    m = g[["src", "dst", "ddst"]].merge(g[["src", "dst", "ddst"]], on="src")
    keep = (m["ddst_x"] < m["ddst_y"]) | (
        (m["ddst_x"] == m["ddst_y"]) & (m["dst_x"] < m["dst_y"])
    )
    m = m[keep]
    w = (
        pd.DataFrame({"src": m["dst_x"].to_numpy(), "dst": m["dst_y"].to_numpy()})
        .groupby(["src", "dst"], sort=False)
        .size()
        .reset_index(name="nw")
    )
    w["nw"] = w["nw"].astype("int64")
    return w


def triangle_stats(
    pairs: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
    pairs_canonical: bool = False,
) -> dict:
    """Exact triangle census of the undirected simple graph induced by
    ``pairs`` (columns ``x, y``; direction/multiplicity ignored) →
    ``{"n_edges", "n_wedges", "n_triangles", "global_cc"}`` where
    ``n_wedges`` = Σᵥ C(deg v, 2) and ``global_cc`` (transitivity) =
    3·triangles / wedges (0.0 on a wedge-free graph).

    ``pairs`` is consumed twice (count for partition sizing, then the
    canonical-edge exchange), so it is materialized ONCE up front —
    edge-scale ids only, and upstream pair emission never re-runs."""
    pairs = pairs.materialize()
    parts = _parts_for(max(pairs.count(), 1), cfg)
    # pairs_canonical=True: caller already ran canonical_edges (lets a
    # combined stats call share ONE dedup exchange across algorithms)
    edges = pairs if pairs_canonical else canonical_edges(pairs, parts).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return {"n_edges": 0, "n_wedges": 0, "n_triangles": 0, "global_cc": 0.0}
    if n_edges <= cfg.graph_driver_max_edges:
        e = edges.to_pandas()
        n_wedges, n_tri = _triangles_driver(e)
    else:
        n_wedges, n_tri = _triangles_distributed(edges, n_edges, cfg)
    gcc = (3.0 * n_tri / n_wedges) if n_wedges else 0.0
    return {
        "n_edges": int(n_edges),
        "n_wedges": int(n_wedges),
        "n_triangles": int(n_tri),
        "global_cc": float(gcc),
    }


def _triangles_driver(e: pd.DataFrame) -> tuple[int, int]:
    """Driver tier: identical plan fully vectorized on FACTORIZED int
    codes — degree-oriented edges, per-bucket wedge self-merge (peak
    memory is one bucket's wedges), closure matching by searchsorted on
    composite int64 keys (no pandas groupby/merge in the hot path)."""
    nodes, xi = np.unique(
        np.concatenate([e["x"].to_numpy(), e["y"].to_numpy()]), return_inverse=True
    )
    n = np.int64(len(nodes))
    x = xi[: len(e)]
    y = xi[len(e):]
    d = np.bincount(x, minlength=len(nodes)) + np.bincount(y, minlength=len(nodes))
    d64 = d.astype(np.int64)
    n_wedges = int((d64 * (d64 - 1) // 2).sum())
    # orient each edge from its lower-(degree, id) endpoint
    flip = (d[y] < d[x]) | ((d[y] == d[x]) & (y < x))
    src = np.where(flip, y, x).astype(np.int64)
    dst = np.where(flip, x, y).astype(np.int64)
    ddst = np.where(flip, d64[x], d64[y])
    closure = np.sort(src * n + dst)
    order = np.argsort(src, kind="stable")
    src, dst, ddst = src[order], dst[order], ddst[order]
    bucket = src % _DRIVER_WEDGE_BUCKETS
    n_tri = 0
    for b in range(_DRIVER_WEDGE_BUCKETS):
        sel = bucket == b
        if not sel.any():
            continue
        g = pd.DataFrame({"src": src[sel], "dst": dst[sel], "ddst": ddst[sel]})
        m = g.merge(g, on="src")
        keep = (m["ddst_x"] < m["ddst_y"]) | (
            (m["ddst_x"] == m["ddst_y"]) & (m["dst_x"] < m["dst_y"])
        )
        keys = m["dst_x"].to_numpy()[keep.to_numpy()] * n + m["dst_y"].to_numpy()[
            keep.to_numpy()
        ]
        idx = np.searchsorted(closure, keys)
        idx[idx >= len(closure)] = len(closure) - 1 if len(closure) else 0
        n_tri += int((closure[idx] == keys).sum()) if len(closure) else 0
    return n_wedges, n_tri


def _triangles_distributed(
    edges: ray.data.Dataset, n_edges: int, cfg: PipelineConfig
) -> tuple[int, int]:
    from .joins import copartition_attach

    parts = _parts_for(n_edges, cfg)
    deg = _degrees(edges, parts).materialize()
    n_wedges = int(
        deg.map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "w": pa.array(
                        (lambda dd: dd * (dd - 1) // 2)(
                            np.asarray(t["d"].combine_chunks(), np.int64)
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("w")
        or 0
    )
    withdeg = copartition_attach(
        copartition_attach(
            edges, deg, "x", "node", {"d": "dx"}, partitions=parts, how="inner"
        ),
        deg, "y", "node", {"d": "dy"}, partitions=parts, how="inner",
    )
    oriented = withdeg.map_batches(_orient, batch_format="pandas").materialize()

    def route_src(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)  # batch may be a zero-copy view
        df["_pkey"] = (_hash_vals(df["src"].to_numpy()) % parts).astype("int32")
        return df

    wedges = compact_nonempty(
        oriented.map_batches(route_src, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(_emit_wedges, batch_format="pandas")
    )

    # closure matching: wedge keys against the (unique) oriented edge
    # set on a composite key through ONE co-partitioning
    def wkey(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["src"].astype(str) + "\x1f" + df["dst"].astype(str),
                "nw": df["nw"].astype("int64"),
            }
        )

    def ekey(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["src"].astype(str) + "\x1f" + df["dst"].astype(str),
                "_m": np.ones(len(df), np.int8),
            }
        )

    matched = copartition_attach(
        wedges.map_batches(wkey, batch_format="pandas"),
        oriented.map_batches(ekey, batch_format="pandas"),
        "key", "key", {"_m": "_m"}, partitions=parts, how="inner",
    )
    n_tri = int(matched.sum("nw") or 0)
    return n_wedges, n_tri


def k_core(
    pairs: ray.data.Dataset, k: int, cfg: PipelineConfig = DEFAULT_CONFIG,
    pairs_canonical: bool = False,
) -> ray.data.Dataset:
    """Nodes of the k-core (maximal subgraph where every node has degree
    ≥ k within the subgraph) → ``Dataset[(node,)]``, possibly empty.

    Iterative peeling: each round drops nodes with current degree < k
    and keeps only edges with both endpoints surviving (two
    co-partitioned semi-joins), until the edge count is stable. Rounds
    are bounded by ``cfg.cc_max_rounds`` — peeling removes ≥1 node per
    non-final round, and real graphs converge in a few rounds; the cap
    is a runaway guard, hitting it returns the (still valid, possibly
    slightly over-full) current survivor set.

    ``pairs`` is consumed three times (count, schema, canonical edges)
    — materialized ONCE up front like ``triangle_stats``."""
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    parts = _parts_for(max(n_pairs, 1), cfg)
    t0 = pairs.schema().types[0] if n_pairs else pa.string()
    if not isinstance(t0, pa.DataType):  # pandas-block dataset: numpy dtype
        t0 = pa.int64() if getattr(t0, "kind", "") in ("i", "u") else pa.string()
    node_type = t0
    empty = ray.data.from_arrow(
        pa.Table.from_pydict({"node": pa.array([], node_type)})
    )
    edges = pairs if pairs_canonical else canonical_edges(pairs, parts).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return empty
    if k <= 0:
        # 0-core = every edge-bearing node
        return _degrees(edges, parts).select_columns(["node"])
    if n_edges <= cfg.graph_driver_max_edges:
        return _k_core_driver(edges.to_pandas(), k)
    return _k_core_distributed(edges, k, parts, cfg, empty)


def _k_core_driver(e: pd.DataFrame, k: int) -> ray.data.Dataset:
    """Driver tier: numpy peeling on factorized node ids."""
    nodes, xi = np.unique(
        np.concatenate([e["x"].to_numpy(), e["y"].to_numpy()]), return_inverse=True
    )
    src = xi[: len(e)]
    dst = xi[len(e):]
    alive_e = np.ones(len(e), bool)
    alive_n = np.ones(len(nodes), bool)
    while True:
        deg = np.bincount(src[alive_e], minlength=len(nodes)) + np.bincount(
            dst[alive_e], minlength=len(nodes)
        )
        drop = alive_n & (deg < k)
        if not drop.any():
            break
        alive_n &= ~drop
        alive_e &= alive_n[src] & alive_n[dst]
    # loop exit ⇔ every alive node already has alive-degree ≥ k
    return ray.data.from_pandas(pd.DataFrame({"node": np.sort(nodes[alive_n])}))


def _k_core_distributed(
    edges: ray.data.Dataset, k: int, parts: int, cfg: PipelineConfig,
    empty: ray.data.Dataset,
) -> ray.data.Dataset:
    from .joins import copartition_attach

    n_prev = edges.count()
    survivors = None
    for _ in range(cfg.cc_max_rounds):
        deg = _degrees(edges, parts)
        survivors = compact_nonempty(
            deg.map_batches(
                lambda df: df[df["d"] >= k][["node"]].assign(
                    _m=np.ones((df["d"] >= k).sum(), np.int8)
                ),
                batch_format="pandas",
            )
        ).materialize()
        if survivors.count() == 0:
            return empty
        edges = compact_nonempty(
            copartition_attach(
                copartition_attach(
                    edges, survivors, "x", "node", {"_m": "_m"},
                    partitions=parts, how="inner",
                ).drop_columns(["_m"]),
                survivors, "y", "node", {"_m": "_m"},
                partitions=parts, how="inner",
            ).drop_columns(["_m"])
        ).materialize()
        n_now = edges.count()
        if n_now == 0:
            return empty
        if n_now == n_prev:
            break
        n_prev = n_now
    if survivors is None or n_prev == 0:
        return empty
    # the stable survivor set IS the k-core's node set (degree recomputed
    # on the final edge set next loop entry confirmed no further drops)
    return survivors.select_columns(["node"])


# --- strongly connected components -------------------------------------------


def _tarjan_scc(adj: dict, nodes_sorted: list) -> dict:
    """Iterative Tarjan: node → min-id-of-its-SCC. Exact, driver-side."""
    index: dict = {}
    low: dict = {}
    onstack: set = set()
    stack: list = []
    comp: dict = {}
    counter = 0
    for root in nodes_sorted:
        if root in index:
            continue
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        onstack.add(root)
        work = [(root, iter(adj.get(root, ())))]
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    onstack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                elif w in onstack:
                    if index[w] < low[v]:
                        low[v] = index[w]
            if not advanced:
                work.pop()
                if work:
                    u = work[-1][0]
                    if low[v] < low[u]:
                        low[u] = low[v]
                if low[v] == index[v]:
                    members = []
                    while True:
                        w = stack.pop()
                        onstack.discard(w)
                        members.append(w)
                        if w == v:
                            break
                    m = min(members)
                    for w in members:
                        comp[w] = m
    return comp


def scc(
    pairs: ray.data.Dataset,
    nodes: ray.data.Dataset,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    max_rounds: int = 24,
) -> ray.data.Dataset:
    """Strongly connected components of the directed graph
    ``pairs[(x, y)]`` over the node universe ``nodes[(node,)]`` →
    ``Dataset[(node, scc)]`` where ``scc`` is the minimum node id of
    the component — the cycle-structure view WCC can't give (every
    multi-member SCC is a directed cycle region).

    Size-tiered: ≤ ``cfg.graph_driver_max_edges`` edges runs iterative
    Tarjan on the driver (exact, linear). Above, the classic
    FORWARD-BACKWARD pivot refinement (Fleischer et al., public): each
    active block elects its min node as pivot (one block-keyed min
    exchange), boolean forward- and backward-reachability from all
    pivots propagate IN PARALLEL across blocks (flag-OR fixpoints —
    per-block-diameter rounds of one co-partitioned attach + routed
    merge each), the Fw∩Bw set resolves as the pivot's SCC, and the
    three remainders (F-only / B-only / neither) refine the block.
    Outer rounds scale with the condensation's peel depth; a residue
    still active after ``max_rounds`` (pathological chain-of-SCCs
    shapes) is finished EXACTLY by pulling the remaining — by then
    small — subgraph to the driver Tarjan (raises if it exceeds the
    driver bound instead of silently mislabeling). Both tiers produce
    identical labels (forced-tier tested)."""
    n_edges = pairs.count()
    if nodes.count() == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"node": pa.array([], pa.string()), "scc": pa.array([], pa.string())}
            )
        )
    if n_edges <= cfg.graph_driver_max_edges:
        ids = sorted(r["node"] for r in nodes.take_all())
        adj: dict = {}
        for r in pairs.take_all():
            adj.setdefault(r["x"], []).append(r["y"])
        for k in adj:
            adj[k].sort()
        comp = _tarjan_scc(adj, ids)
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "node": pa.array(ids, pa.string()),
                    "scc": pa.array([comp[v] for v in ids], pa.string()),
                }
            )
        )
    return _scc_distributed(pairs, nodes, cfg, max_rounds)


def _reach_fixpoint(
    eact: ray.data.Dataset,
    flags: ray.data.Dataset,
    src_col: str,
    dst_col: str,
    parts: int,
) -> ray.data.Dataset:
    """Boolean reachability FIXPOINT (runs to completion — a truncated
    reach would silently split an SCC across refinement blocks):
    ``flags[(node, f)]`` with f=1 at pivots; propagate f along
    ``src_col → dst_col`` edges of ``eact`` (already restricted to
    intra-block, active edges) until the frontier empties. FRONTIER
    propagation: each round joins only the NEWLY-flagged nodes against
    the edges (not the whole flagged set), so total shuffled rows are
    O(edges) across the whole fixpoint, and termination is guaranteed
    in ≤ block-size rounds (flags grow monotonically)."""
    from ..ops.joins import copartition_attach

    state = flags.materialize()
    if eact.count() == 0:  # no intra-block edges: flags stay at the seeds
        return state
    frontier = compact_nonempty(
        state.map_batches(
            lambda df: df[df["f"] == 1][["node"]], batch_format="pandas"
        )
    )
    while frontier.count():
        hits = compact_nonempty(
            copartition_attach(
                eact,
                frontier.map_batches(
                    lambda df: df.assign(sf=np.int8(1)), batch_format="pandas"
                ),
                src_col, "node", {"sf": "sf"},
                partitions=parts, how="inner",
            )
        )
        if hits.count() == 0:
            break

        def reach_partial(df: pd.DataFrame, _d=dst_col) -> pd.DataFrame:
            g = df[[_d]].drop_duplicates()
            g = g.rename(columns={_d: "node"})
            g["rf"] = np.int8(1)
            g["_pkey"] = (
                pd.util.hash_array(g["node"].to_numpy(dtype=object)) % parts
            ).astype("int32")
            return g

        inbound = compact_nonempty(
            hits.map_batches(reach_partial, batch_format="pandas")
            .groupby("_pkey")
            .map_groups(
                lambda g: g.drop_duplicates("node")[["node", "rf"]],
                batch_format="pandas",
            )
        )

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            newf = np.maximum(
                df["f"].to_numpy(np.int8),
                df["rf"].fillna(0).to_numpy(np.int8),
            )
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "f": newf,
                    "changed": (newf != df["f"].to_numpy(np.int8)).astype(np.int8),
                }
            )

        state = (
            copartition_attach(
                state, inbound, "node", "node", {"rf": "rf"},
                partitions=parts, how="left",
            )
            .map_batches(fold, batch_format="pandas")
            .materialize()
        )
        frontier = compact_nonempty(
            state.map_batches(
                lambda df: df[df["changed"] == 1][["node"]], batch_format="pandas"
            )
        )
        state = state.map_batches(
            lambda df: df[["node", "f"]], batch_format="pandas"
        ).materialize()
    return state.map_batches(lambda df: df[["node", "f"]], batch_format="pandas")


def _scc_distributed(
    pairs: ray.data.Dataset,
    nodes: ray.data.Dataset,
    cfg: PipelineConfig,
    max_rounds: int,
) -> ray.data.Dataset:
    from ..ops.joins import copartition_attach

    parts = max(
        1, min(cfg.agg_partitions, pairs.count() // cfg.cc_rows_per_partition + 1)
    )
    edges = pairs.map_batches(
        lambda df: df[["x", "y"]].drop_duplicates(), batch_format="pandas"
    ).materialize()
    active = nodes.map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "part": ""}),
        batch_format="pandas",
    ).materialize()
    done_tables: list = []

    for _ in range(max_rounds):
        n_active = active.count()
        if n_active == 0:
            break
        # intra-block active edges: attach both endpoints' parts
        e1 = compact_nonempty(
            copartition_attach(
                edges, active, "x", "node", {"part": "px"},
                partitions=parts, how="inner",
            )
        )
        eact = (
            compact_nonempty(
                copartition_attach(
                    e1, active, "y", "node", {"part": "py"},
                    partitions=parts, how="inner",
                ).map_batches(
                    lambda df: df[df["px"] == df["py"]][["x", "y"]],
                    batch_format="pandas",
                )
            )
            if e1.count()
            else e1
        )
        if eact.count() == 0:
            # no intra-block edges anywhere → every active node is a
            # singleton SCC of itself
            done_tables.append(
                active.map_batches(
                    lambda df: pd.DataFrame(
                        {"node": df["node"], "scc": df["node"]}
                    ),
                    batch_format="pandas",
                )
            )
            active = compact_nonempty(
                active.map_batches(lambda df: df.iloc[0:0], batch_format="pandas")
            )
            break
        # pivot per block: min node (one block-keyed exchange)
        def piv_partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("part", sort=False)["node"].min().reset_index()
            g["_pkey"] = (
                pd.util.hash_array(g["part"].to_numpy(dtype=object)) % parts
            ).astype("int32")
            return g

        pivots = compact_nonempty(
            active.map_batches(piv_partial, batch_format="pandas")
            .groupby("_pkey")
            .map_groups(
                lambda g: g.groupby("part", sort=False)["node"]
                .min()
                .reset_index()
                .rename(columns={"node": "pivot"}),
                batch_format="pandas",
            )
        )
        seeded = copartition_attach(
            active, pivots, "part", "part", {"pivot": "pivot"},
            partitions=parts, how="inner",
        ).materialize()

        def seed(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "f": (df["node"] == df["pivot"]).astype(np.int8),
                }
            )

        flags0 = seeded.map_batches(seed, batch_format="pandas")
        fw = _reach_fixpoint(eact, flags0, "x", "y", parts)
        bw = _reach_fixpoint(eact, flags0, "y", "x", parts)

        folded = copartition_attach(
            copartition_attach(
                seeded, fw, "node", "node", {"f": "inF"},
                partitions=parts, how="left",
            ),
            bw, "node", "node", {"f": "inB"},
            partitions=parts, how="left",
        )

        def split(df: pd.DataFrame) -> pd.DataFrame:
            inf = df["inF"].fillna(0).to_numpy(np.int8)
            inb = df["inB"].fillna(0).to_numpy(np.int8)
            done = (inf == 1) & (inb == 1)
            tag = np.where(inf == 1, "f", np.where(inb == 1, "b", "n"))
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "part": df["part"].astype(str) + tag,
                    "pivot": df["pivot"],
                    "done": done.astype(np.int8),
                }
            )

        folded = compact_nonempty(
            folded.map_batches(split, batch_format="pandas")
        ).materialize()
        new_done = folded.map_batches(
            lambda df: df[df["done"] == 1][["node"]].assign(
                scc=df[df["done"] == 1]["pivot"]
            ),
            batch_format="pandas",
        )
        done_tables.append(compact_nonempty(new_done))
        active = compact_nonempty(
            folded.map_batches(
                lambda df: df[df["done"] == 0][["node", "part"]],
                batch_format="pandas",
            )
        ).materialize()

    leftover = active.count()
    if leftover:
        # pathological residue: finish EXACTLY on the driver — bounded by
        # the driver-memory cap (cc_driver_max_pairs), NOT the tier gate
        # (a forced-distributed cfg zeroes the gate but the residue step
        # is inherently driver-resident)
        if leftover > cfg.cc_driver_max_pairs:
            raise RuntimeError(
                f"SCC residue of {leftover} nodes after {max_rounds} rounds "
                "exceeds the driver bound; raise max_rounds"
            )
        rem_nodes = sorted(r["node"] for r in active.take_all())
        rem_set = set(rem_nodes)
        e1 = compact_nonempty(
            copartition_attach(
                edges,
                active.map_batches(
                    lambda df: df.assign(_m=np.int8(1))[["node", "_m"]],
                    batch_format="pandas",
                ),
                "x", "node", {"_m": "_m"}, partitions=parts, how="inner",
            )
        )
        rem_edges = [
            (r["x"], r["y"]) for r in e1.take_all() if r["y"] in rem_set
        ]
        adj: dict = {}
        for a, b in rem_edges:
            adj.setdefault(a, []).append(b)
        for k in adj:
            adj[k].sort()
        comp = _tarjan_scc(adj, rem_nodes)
        done_tables.append(
            ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "node": pa.array(rem_nodes, pa.string()),
                        "scc": pa.array([comp[v] for v in rem_nodes], pa.string()),
                    }
                )
            )
        )
    out = done_tables[0]
    for t in done_tables[1:]:
        out = out.union(t)
    return out.map_batches(
        lambda df: df[["node", "scc"]], batch_format="pandas"
    )


# --- modularity of a community partition -------------------------------------


def modularity(
    edges: ray.data.Dataset,
    assign: ray.data.Dataset,
    parts: int = 64,
) -> float:
    """Newman modularity Q of a community ASSIGNMENT over an undirected
    simple graph: Q = (Σ_c m_c)/m − Σ_c (D_c / 2m)² — the quality score
    for LPA/community output. ``edges`` has columns (x, y) (loops and
    duplicate pairs collapse); ``assign`` has (node, community), unique
    per node; edges with an unassigned endpoint are dropped.

    Scale shape: two ``copartition_attach`` lookups stamp each edge with
    its endpoint communities (the assignment is a node-scale dimension —
    never broadcast, never on the driver); the intra-edge count is a
    map-only sum, and Σ D_c² folds per community-routed partition into
    ONE scalar per partition, so driver state is ``parts`` floats no
    matter how many communities exist."""
    import pyarrow as _pa

    from .joins import copartition_attach

    # orientation/dedup is exactly canonical_edges' job (pair-keyed
    # routing, so a hub node's edges spread across groups)
    dedup = canonical_edges(
        edges.map_batches(
            lambda df: df.dropna(subset=["x", "y"]), batch_format="pandas"
        ),
        parts,
    ).materialize()

    if dedup.count() == 0:
        return 0.0

    stamped = copartition_attach(
        copartition_attach(
            dedup, assign, "x", "node", {"community": "cx"}, partitions=parts
        ),
        assign, "y", "node", {"community": "cy"}, partitions=parts,
    ).materialize()

    m = stamped.count()
    if m == 0:
        return 0.0

    def intra_partial(t: _pa.Table) -> _pa.Table:
        import pyarrow.compute as _pc

        eq = _pc.sum(
            _pc.cast(_pc.equal(t["cx"], t["cy"]), _pa.int64())
        ).as_py() or 0
        return _pa.Table.from_pydict({"n": _pa.array([eq], _pa.int64())})

    intra = sum(
        r["n"] for r in stamped.map_batches(
            intra_partial, batch_format="pyarrow"
        ).take_all()
    )

    # Σ_c D_c²: community-routed degree fold, one scalar per partition
    def degree_rows(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.concat([df["cx"], df["cy"]], ignore_index=True).astype(object)
        out = pd.DataFrame({"community": c})
        out["_pkey"] = (_hash_vals(out["community"].to_numpy()) % parts).astype(
            np.int32
        )
        return out

    def sq_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("community", sort=False).size().to_numpy(np.float64)
        return pd.DataFrame({"sq": [float((d * d).sum())]})

    sq = sum(
        r["sq"] for r in compact_nonempty(
            stamped.map_batches(degree_rows, batch_format="pandas")
        )
        .groupby("_pkey")
        .map_groups(sq_partial, batch_format="pandas")
        .take_all()
    )
    return intra / m - sq / (4.0 * m * m)


def community_stats(
    edges: ray.data.Dataset,
    assign: ray.data.Dataset,
    parts: int = 64,
) -> ray.data.Dataset:
    """Per-community structure diagnostics for an assignment over an
    undirected simple graph: ``(community, n_nodes, n_internal, n_cut,
    volume, conductance)`` where volume = Σ degrees, n_cut = edges with
    exactly one endpoint inside, and conductance = n_cut / min(volume,
    2m − volume) (0 when the denominator is 0 — a community spanning
    the whole graph). The per-community sibling of ``modularity`` —
    same two ``copartition_attach`` stamps, then ONE community-routed
    exchange carrying (community, int, int, int) partial rows."""
    from .joins import copartition_attach

    dedup = canonical_edges(
        edges.map_batches(
            lambda df: df.dropna(subset=["x", "y"]), batch_format="pandas"
        ),
        parts,
    ).materialize()
    m = dedup.count()
    empty = pd.DataFrame(
        {"community": pd.Series([], dtype=object),
         "n_nodes": pd.Series([], dtype=np.int64),
         "n_internal": pd.Series([], dtype=np.int64),
         "n_cut": pd.Series([], dtype=np.int64),
         "volume": pd.Series([], dtype=np.int64),
         "conductance": pd.Series([], dtype=np.float64)}
    )
    if m == 0:
        return ray.data.from_pandas(empty)

    stamped = copartition_attach(
        copartition_attach(
            dedup, assign, "x", "node", {"community": "cx"}, partitions=parts
        ),
        assign, "y", "node", {"community": "cy"}, partitions=parts,
    )

    # per-batch partials: (community, internal, cut, degree) int rows
    def partials(df: pd.DataFrame) -> pd.DataFrame:
        cx = df["cx"].astype(object)
        cy = df["cy"].astype(object)
        same = (cx == cy).to_numpy()
        rows = pd.DataFrame(
            {"community": pd.concat([cx, cy], ignore_index=True),
             "internal": np.concatenate([same, same]).astype(np.int64),
             "cut": np.concatenate([~same, ~same]).astype(np.int64),
             "deg": np.ones(2 * len(df), np.int64)}
        )
        agg = rows.groupby("community", sort=False).sum().reset_index()
        return agg

    def route(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["_pkey"] = (_hash_vals(out["community"].to_numpy()) % parts).astype(
            np.int32
        )
        return out

    # node counts per community travel the same exchange
    def node_partials(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("community", sort=False).size().reset_index(name="nn")
        return pd.DataFrame(
            {"community": agg["community"].astype(object),
             "internal": np.int64(0), "cut": np.int64(0),
             "deg": np.int64(0), "nn": agg["nn"].to_numpy(np.int64)}
        )

    def add_nn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["nn"] = np.int64(0)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("community", sort=False)[
            ["internal", "cut", "deg", "nn"]
        ].sum()
        # internal edges were double-counted (one row per endpoint, both
        # in the community); a cut edge lands in each community ONCE
        n_int = (agg["internal"] // 2).to_numpy(np.int64)
        n_cut = agg["cut"].to_numpy(np.int64)
        vol = agg["deg"].to_numpy(np.int64)
        other = 2 * m - vol
        den = np.minimum(vol, other)
        cond = np.where(den > 0, n_cut / np.maximum(den, 1), 0.0)
        return pd.DataFrame(
            {"community": agg.index.astype(object),
             "n_nodes": agg["nn"].to_numpy(np.int64),
             "n_internal": n_int, "n_cut": n_cut, "volume": vol,
             "conductance": cond.astype(np.float64)}
        )

    unioned = (
        stamped.map_batches(partials, batch_format="pandas")
        .map_batches(add_nn, batch_format="pandas")
        .union(assign.map_batches(node_partials, batch_format="pandas"))
    )
    return compact_nonempty(
        unioned.map_batches(route, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(fold, batch_format="pandas")
    )
