"""Sampled betweenness centrality (Brandes 2001, public) over plain
edge-pair datasets — the classic shortest-path centrality, completing
the engine's centrality family (PageRank = eigenvector-flavour,
HyperBall harmonic = distance-flavour, this = path-flavour).

Estimator: pick ``k_sources`` sources deterministically (smallest
stable hash of the node id — both tiers pick the IDENTICAL set), run
Brandes' single-source dependency accumulation from each, and scale the
summed dependencies by ``n_nodes / k``. With ``k >= n`` every node is a
source, the scale is 1, and the result is EXACT Brandes betweenness
(each unordered pair contributes from both endpoints on undirected
graphs — the raw Brandes accumulation; no ÷2 is applied).

Size-tiered the engine's usual way on ``cfg.graph_driver_max_edges``
deduplicated edges:

- **Driver tier**: CSR-style adjacency dicts + per-source BFS and
  backward sweep — exact, k × O(m).
- **Distributed tier**: ALL k sources advance SIMULTANEOUSLY on the
  composite key (source, node). Forward = one level-synchronous BFS
  round per distance: frontier⋈adjacency co-grouped by node, σ summed
  per (s, v), visited anti-join — two hash exchanges per round, rows
  are (s, v, σ) only. Backward = Brandes' dependency sweep level by
  level: (1+δ_w)/σ_w coefficients expand through the REVERSED
  adjacency, predecessor-filter + σ_x multiply per (s, x) — three
  exchanges per level. Rounds are bounded by the traversed eccentricity
  of the sampled sources (web graphs: the effective diameter), NOT by
  k — adding sources adds rows, not rounds. Per-level frontiers are
  node-scale datasets; no driver state beyond the k-scale source list.

Partitioning assumption: one hash partition's frontier rows fit in a
worker's heap (the triangle-census wedge assumption). Reference analog:
the reference's whole-graph statistics are computed driver-side after a
full Neo4j load (``blarify/repositories/graph_db_manager/
queries.py:1692-1849``); this is that family at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..util import compact_nonempty
from .graph import _hash_vals, _parts_for


def _empty_bc() -> ray.data.Dataset:
    return ray.data.from_pandas(
        pd.DataFrame({"node": pd.Series([], dtype=object),
                      "bc": pd.Series([], dtype=np.float64)})
    )


def _clean_edges(
    edges: ray.data.Dataset, directed: bool, parts: int = 64
) -> ray.data.Dataset:
    """Distinct non-loop arcs; undirected input symmetrizes. Dedup is
    PAIR-keyed (the ``canonical_edges`` discipline) so a hub node's arcs
    spread across hash groups instead of piling into one."""
    dropped = edges.map_batches(
        lambda df: df.dropna(subset=["x", "y"]), batch_format="pandas"
    )
    if not directed:
        from .graph import canonical_edges

        und = canonical_edges(dropped, parts)

        def sym(df: pd.DataFrame) -> pd.DataFrame:
            back = df.rename(columns={"x": "y", "y": "x"})
            return pd.concat([df, back[["x", "y"]]], ignore_index=True)

        return compact_nonempty(
            und.map_batches(sym, batch_format="pandas")
        ).materialize()

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["x"] != df["y"]][["x", "y"]].drop_duplicates().copy()
        df["_pkey"] = (
            (_hash_vals(df["x"].to_numpy()) * np.uint64(31)
             + _hash_vals(df["y"].to_numpy())) % parts
        ).astype(np.int32)
        return df

    return compact_nonempty(
        dropped.map_batches(route, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g[["x", "y"]].drop_duplicates(), batch_format="pandas"
        )
    ).materialize()


def _nodes_of(adj: ray.data.Dataset) -> ray.data.Dataset:
    parts = 64

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.unique(pd.concat([df["x"], df["y"]], ignore_index=True))
        out = pd.DataFrame({"node": pd.Series(vals, dtype=object)})
        out["_pkey"] = (_hash_vals(out["node"].to_numpy()) % parts).astype(np.int32)
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.Series(pd.unique(g["node"]), dtype=object)})

    return compact_nonempty(
        adj.map_batches(emit, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(dedup, batch_format="pandas")
    ).materialize()


def _pick_sources(nodes: ray.data.Dataset, k: int, seed: int) -> list:
    """k nodes with the smallest (hash(node, seed), node) — per-batch
    partial top-k, k-scale driver merge; identical in both tiers."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # wrap the seed mix in Python-int space, THEN convert — numpy
        # scalar multiply would warn on overflow for any seed >= 2
        mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        h = _hash_vals(df["node"].to_numpy()) ^ mix
        d = pd.DataFrame({"node": df["node"].astype(object), "h": h})
        return d.sort_values(["h", "node"]).head(k)

    rows = nodes.map_batches(partial, batch_format="pandas").take_all()
    d = pd.DataFrame({"node": [r["node"] for r in rows], "h": [r["h"] for r in rows]})
    return d.sort_values(["h", "node"]).head(k)["node"].tolist()


# ------------------------------------------------------------------ driver tier


def _brandes_driver(
    edges_df: pd.DataFrame, sources: list, nodes: list
) -> pd.DataFrame:
    from collections import deque

    adj: dict = {}
    for x, y in zip(edges_df["x"], edges_df["y"]):
        adj.setdefault(x, []).append(y)
    bc = {v: 0.0 for v in nodes}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return pd.DataFrame(
        {"node": pd.Series(nodes, dtype=object),
         "bc": np.array([bc[v] for v in nodes], np.float64)}
    )


# -------------------------------------------------------------- distributed tier


def _route_frame(df: pd.DataFrame, keys: np.ndarray, parts: int) -> pd.DataFrame:
    df = df.copy()
    df["_pkey"] = (keys % parts).astype(np.int32)
    return df


def _sv_hash(s: pd.Series, v: pd.Series) -> np.ndarray:
    return _hash_vals(s.to_numpy()) * np.uint64(1_000_003) + _hash_vals(v.to_numpy())


def _brandes_distributed(
    adj: ray.data.Dataset, sources: list, nodes: ray.data.Dataset,
    parts: int, cfg: PipelineConfig,
) -> ray.data.Dataset:
    # ---- forward: level-synchronous multi-source BFS on (s, v) --------------
    f0 = pd.DataFrame(
        {"s": pd.Series(sources, dtype=object),
         "v": pd.Series(sources, dtype=object),
         "sigma": np.ones(len(sources), np.float64)}
    )
    # from_pandas yields ARROW blocks in Ray 2.49; a later union with
    # pandas-block map outputs crashes the sort — normalize via identity
    def _pd(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(lambda d: d, batch_format="pandas")

    levels = [_pd(ray.data.from_pandas(f0)).materialize()]
    visited = _pd(ray.data.from_pandas(f0[["s", "v"]])).materialize()

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        fr = g[g["_side"] == 0][["s", "v", "sigma"]]
        ad = g[g["_side"] == 1][["v", "w"]]
        if not len(fr) or not len(ad):
            return pd.DataFrame(
                {"s": pd.Series([], dtype=object), "w": pd.Series([], dtype=object),
                 "sigma": pd.Series([], dtype=np.float64)}
            )
        m = fr.merge(ad, on="v")
        out = m.groupby(["s", "w"], sort=False)["sigma"].sum().reset_index()
        return pd.DataFrame(
            {"s": out["s"].astype(object), "w": out["w"].astype(object),
             "sigma": out["sigma"].to_numpy(np.float64)}
        )

    def mk_front_side(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["w"] = None
        out["_side"] = np.int8(0)
        return _route_frame(out, _hash_vals(out["v"].to_numpy()), parts)

    def mk_adj_side(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"s": None, "v": df["x"].astype(object), "sigma": 0.0,
             "w": df["y"].astype(object)}
        )
        out["_side"] = np.int8(1)
        return _route_frame(out, _hash_vals(out["v"].to_numpy()), parts)

    # NOTE: union sides must share one block type — keep every union
    # input a pandas map_batches output (compact_nonempty materializes
    # ARROW blocks, which crash the sort when unioned with pandas)
    adj_side = adj.map_batches(mk_adj_side, batch_format="pandas").materialize()

    def sigma_new(g: pd.DataFrame) -> pd.DataFrame:
        cand = g[g["_side"] == 0][["s", "w", "sigma"]]
        seen = g[g["_side"] == 1][["s", "w"]]
        if not len(cand):
            return pd.DataFrame(
                {"s": pd.Series([], dtype=object), "v": pd.Series([], dtype=object),
                 "sigma": pd.Series([], dtype=np.float64)}
            )
        tot = cand.groupby(["s", "w"], sort=False)["sigma"].sum().reset_index()
        if len(seen):
            mk = tot.merge(seen.drop_duplicates(), on=["s", "w"],
                           how="left", indicator=True)
            tot = mk[mk["_merge"] == "left_only"][["s", "w", "sigma"]]
        return pd.DataFrame(
            {"s": tot["s"].astype(object), "v": tot["w"].astype(object),
             "sigma": tot["sigma"].to_numpy(np.float64)}
        )

    for _ in range(max(cfg.cc_max_rounds * 4, 48)):
        cand = compact_nonempty(
            levels[-1]
            .map_batches(mk_front_side, batch_format="pandas")
            .union(adj_side)
            .groupby("_pkey")
            .map_groups(expand, batch_format="pandas")
        )

        def mk_cand_side(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["_side"] = np.int8(0)
            return _route_frame(out, _sv_hash(out["s"], out["w"]), parts)

        def mk_seen_side(df: pd.DataFrame) -> pd.DataFrame:
            out = df.rename(columns={"v": "w"}).copy()
            out["sigma"] = 0.0
            out["_side"] = np.int8(1)
            return _route_frame(out, _sv_hash(out["s"], out["w"]), parts)

        new = compact_nonempty(
            cand.map_batches(mk_cand_side, batch_format="pandas")
            .union(visited.map_batches(mk_seen_side, batch_format="pandas"))
            .groupby("_pkey")
            .map_groups(sigma_new, batch_format="pandas")
        ).materialize()
        if new.count() == 0:
            break
        levels.append(new)
        visited = visited.union(
            new.map_batches(
                lambda df: df[["s", "v"]], batch_format="pandas"
            )
        ).materialize()
    else:
        raise RuntimeError(
            "betweenness BFS did not terminate within the round cap; "
            "raise cfg.cc_max_rounds for graphs of this diameter"
        )

    # ---- backward: dependency sweep, deepest level first --------------------
    acc: list[ray.data.Dataset] = []
    # delta of the deepest level is 0 — represented by an empty delta table
    delta = None  # Dataset (s, v, delta) for level d+1; None == all-zero

    def coef_rows(g: pd.DataFrame) -> pd.DataFrame:
        lvl = g[g["_side"] == 0][["s", "v", "sigma"]]
        dl = g[g["_side"] == 1][["s", "v", "delta"]]
        if not len(lvl):
            return pd.DataFrame(
                {"s": pd.Series([], dtype=object), "w": pd.Series([], dtype=object),
                 "coef": pd.Series([], dtype=np.float64)}
            )
        if len(dl):
            m = lvl.merge(dl, on=["s", "v"], how="left")
            d = m["delta"].fillna(0.0).to_numpy(np.float64)
        else:
            m = lvl
            d = np.zeros(len(lvl), np.float64)
        return pd.DataFrame(
            {"s": m["s"].astype(object), "w": m["v"].astype(object),
             "coef": (1.0 + d) / m["sigma"].to_numpy(np.float64)}
        )

    def pred_expand(g: pd.DataFrame) -> pd.DataFrame:
        cf = g[g["_side"] == 0][["s", "w", "coef"]]
        ra = g[g["_side"] == 1][["w", "x"]]
        if not len(cf) or not len(ra):
            return pd.DataFrame(
                {"s": pd.Series([], dtype=object), "x": pd.Series([], dtype=object),
                 "coef": pd.Series([], dtype=np.float64)}
            )
        m = cf.merge(ra, on="w")
        out = m.groupby(["s", "x"], sort=False)["coef"].sum().reset_index()
        return pd.DataFrame(
            {"s": out["s"].astype(object), "x": out["x"].astype(object),
             "coef": out["coef"].to_numpy(np.float64)}
        )

    def delta_rows(g: pd.DataFrame) -> pd.DataFrame:
        co = g[g["_side"] == 0][["s", "x", "coef"]]
        lv = g[g["_side"] == 1][["s", "x", "sigma"]]
        if not len(co) or not len(lv):
            return pd.DataFrame(
                {"s": pd.Series([], dtype=object), "v": pd.Series([], dtype=object),
                 "delta": pd.Series([], dtype=np.float64)}
            )
        tot = co.groupby(["s", "x"], sort=False)["coef"].sum().reset_index()
        m = tot.merge(lv, on=["s", "x"])
        return pd.DataFrame(
            {"s": m["s"].astype(object), "v": m["x"].astype(object),
             "delta": (m["sigma"].to_numpy(np.float64) * m["coef"].to_numpy(np.float64))}
        )

    # reversed adjacency side (x -> w becomes key w with payload x)
    def mk_radj_side(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"s": None, "w": df["y"].astype(object), "coef": 0.0,
             "x": df["x"].astype(object)}
        )
        out["_side"] = np.int8(1)
        return _route_frame(out, _hash_vals(out["w"].to_numpy()), parts)

    radj_side = adj.map_batches(mk_radj_side, batch_format="pandas").materialize()

    for d in range(len(levels) - 1, 0, -1):
        lvl = levels[d]

        def mk_lvl_side(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["delta"] = 0.0
            out["_side"] = np.int8(0)
            return _route_frame(out, _sv_hash(out["s"], out["v"]), parts)

        def mk_delta_side(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["sigma"] = 0.0
            out["_side"] = np.int8(1)
            out = out[["s", "v", "sigma", "delta", "_side"]]
            return _route_frame(out, _sv_hash(out["s"], out["v"]), parts)

        lvl_routed = lvl.map_batches(mk_lvl_side, batch_format="pandas")
        if delta is not None:
            lvl_routed = lvl_routed.union(
                delta.map_batches(mk_delta_side, batch_format="pandas")
            )
        coefs = compact_nonempty(
            lvl_routed.groupby("_pkey").map_groups(coef_rows, batch_format="pandas")
        )

        def mk_coef_side(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["x"] = None
            out["_side"] = np.int8(0)
            return _route_frame(out, _hash_vals(out["w"].to_numpy()), parts)

        contrib = compact_nonempty(
            coefs.map_batches(mk_coef_side, batch_format="pandas")
            .union(radj_side)
            .groupby("_pkey")
            .map_groups(pred_expand, batch_format="pandas")
        )

        prev = levels[d - 1]

        def mk_contrib_side(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["sigma"] = 0.0
            out["_side"] = np.int8(0)
            out = out[["s", "x", "coef", "sigma", "_side"]]
            return _route_frame(out, _sv_hash(out["s"], out["x"]), parts)

        def mk_prev_side(df: pd.DataFrame) -> pd.DataFrame:
            out = df.rename(columns={"v": "x"}).copy()
            out["coef"] = 0.0
            out["_side"] = np.int8(1)
            out = out[["s", "x", "coef", "sigma", "_side"]]
            return _route_frame(out, _sv_hash(out["s"], out["x"]), parts)

        delta = compact_nonempty(
            contrib.map_batches(mk_contrib_side, batch_format="pandas")
            .union(prev.map_batches(mk_prev_side, batch_format="pandas"))
            .groupby("_pkey")
            .map_groups(delta_rows, batch_format="pandas")
        ).materialize()
        if d - 1 > 0:
            # interior nodes at level d-1 accumulate their dependency
            acc.append(delta)
        # sources (level 0) are excluded from bc by construction

    # ---- fold: bc(v) = Σ_s delta_s(v), all nodes present -------------------
    def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"].astype(object),
             "bc": np.zeros(len(df), np.float64)}
        )

    folded = nodes.map_batches(zero_rows, batch_format="pandas")
    for a in acc:
        folded = folded.union(
            a.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["v"].astype(object),
                     "bc": df["delta"].to_numpy(np.float64)}
                ),
                batch_format="pandas",
            )
        )

    def route_node(df: pd.DataFrame) -> pd.DataFrame:
        return _route_frame(df, _hash_vals(df["node"].to_numpy()), parts)

    def sum_bc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False)["bc"].sum().reset_index()
        return pd.DataFrame(
            {"node": out["node"].astype(object),
             "bc": out["bc"].to_numpy(np.float64)}
        )

    return compact_nonempty(
        folded.map_batches(route_node, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(sum_bc, batch_format="pandas")
    )


# ----------------------------------------------------------------- entry point


def betweenness_sampled(
    edges: ray.data.Dataset,
    k_sources: int = 16,
    seed: int = 13,
    directed: bool = False,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """(node, bc) for every node of ``edges`` (columns ``x``, ``y``).
    ``bc`` is the Brandes dependency sum over the k sampled sources
    scaled by n/k; ``k_sources >= n`` ⇒ exact betweenness. Both tiers
    produce the same result to float-summation tolerance (forced-tier
    tested)."""
    adj = _clean_edges(edges, directed)
    n_edges = adj.count()
    if n_edges == 0:
        return _empty_bc()
    nodes = _nodes_of(adj)
    n_nodes = nodes.count()
    k = min(k_sources, n_nodes)
    sources = _pick_sources(nodes, k, seed)
    scale = float(n_nodes) / float(k)

    if n_edges <= cfg.graph_driver_max_edges:
        e = adj.to_pandas()
        node_list = sorted(r["node"] for r in nodes.take_all())
        out = _brandes_driver(e, sources, node_list)
        out["bc"] = out["bc"] * scale
        return ray.data.from_pandas(out)

    parts = _parts_for(n_edges, cfg)
    raw = _brandes_distributed(adj, sources, nodes, parts, cfg)
    return raw.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].astype(object),
             "bc": df["bc"].to_numpy(np.float64) * scale}
        ),
        batch_format="pandas",
    )
