"""Graph-structure / set-op / pivot / vector-radius oracle battery.

Fourth extension battery (same self-register contract as
``analytics_ext`` — registers into ``analytics.QUERIES``/``ORACLE_SQL``
at the bottom; helpers from other batteries import inside functions,
never at module top). Every query is DuckDB-oracle-checked.

- copurchase_triangles  exact triangle census of the part co-purchase
                        graph (parts linked iff bought in one order) —
                        the distributed degree-oriented wedge-join of
                        ``ops/graph.triangle_stats``; the SQL oracle is
                        the canonical three-way self-join. Scale shape:
                        baskets co-partition by order, edges/wedges move
                        as id pairs + small ints, never wholesale.
- repeat_buyers         INTERSECT set semantics (customers ordering in
                        BOTH years): per-batch distinct (key, year-bit)
                        partials, ONE key-routed bit-OR merge, mask
                        filter — the id universe never lands on the
                        driver.
- orders_status_pivot   conditional-aggregation pivot (COUNT/SUM FILTER
                        per status, one row per year): classic combiner
                        — per-batch partial pivot, year-keyed merge of
                        a years×statuses-scale table.
- vector_range_count    cosine RADIUS search (the top-k query's
                        threshold sibling): per-batch matmul against a
                        3-vector query matrix, count partials only —
                        counts are integer-robust to DuckDB's float32
                        cosine kernel (measured gap to the threshold is
                        ~1e-3 vs ~1e-7 float error; an output of raw
                        similarities would NOT hash-match).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analytics import ROUTE_PARTS, _cents, _route, _t

# --- copurchase_triangles ---------------------------------------------------


def q_copurchase_triangles(sf_dir: str):
    """Triangle census of the undirected part co-purchase graph: nodes =
    parts, edge (u, v) iff some order contains both. Pair emission is
    the ``parts_bought_together`` co-partitioned basket self-merge
    (analytics_win.py); the census itself is the size-tiered
    degree-oriented wedge join (``ops/graph.triangle_stats`` — driver
    pandas under ``cfg.graph_driver_max_edges`` dedup'd edges,
    co-partitioned exchanges above, forced-tier tested)."""
    from ..ops.graph import triangle_stats

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def route(df: pd.DataFrame) -> pd.DataFrame:
        return _route(df.drop_duplicates(), "l_orderkey")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        p = m[["l_partkey_a", "l_partkey_b"]].drop_duplicates()
        p.columns = ["x", "y"]
        return p.astype({"x": np.int64, "y": np.int64})

    pairs = (
        li.map_batches(route, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(emit_pairs, batch_format="pandas")
    )
    st = triangle_stats(pairs)
    return pd.DataFrame(
        {
            "n_edges": pd.Series([st["n_edges"]], dtype="int64"),
            "n_wedges": pd.Series([st["n_wedges"]], dtype="int64"),
            "n_triangles": pd.Series([st["n_triangles"]], dtype="int64"),
            "global_cc": pd.Series([st["global_cc"]], dtype="float64"),
        }
    )


SQL_COPURCHASE_TRIANGLES = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node
),
agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges,
         (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM pairs e1
          JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
          JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
)
SELECT n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0 THEN 3.0 * n_triangles / n_wedges
            ELSE 0.0 END AS global_cc
FROM agg
"""

# --- copurchase_two_hop (friends-of-friends) ---------------------------------


def _dropped_centers(adj, max_degree: int) -> int:
    """Count of wedge CENTERS whose distinct-neighbor degree exceeds the
    cap — the explicit drop metric for capped wedge enumeration (the
    ``max_lsh_bucket`` pattern: bound the quadratic hot spot, surface
    what was skipped). One src-routed exchange of int partials."""

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        deg = g.groupby("src", sort=False).size()
        return pd.DataFrame({"n": [int((deg > max_degree).sum())]})

    d = (
        adj.map_batches(lambda df: _route(df, "src"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(part, batch_format="pandas")
        .to_pandas()
    )
    return int(d["n"].sum()) if len(d) else 0


def q_copurchase_two_hop(
    sf_dir: str, max_degree: int | None = None, stats: dict | None = None
):
    """Distinct 2-hop-ONLY neighborhood size per part: nodes reachable
    in exactly two hops of the co-purchase graph, excluding self and
    direct neighbors; parts with an empty 2-hop-only set emit no row
    (matching the SQL's inner GROUP BY).

    Scale shape: two exchanges. (1) adjacency routed by MID — each
    mid's neighbor list self-merges into wedge endpoints (a, b), the
    same Θ(Σ deg(m)²) wedge enumeration the triangle census already
    pays; ids only, never baskets. (2) candidates ∪ direct-edge marker
    rows routed by NODE — one co-partitioned anti-join + distinct count
    per group, so no neighbor set ever lands on the driver.

    ``max_degree`` (optional) bounds the quadratic term on power-law
    graphs: wedge centers with more than ``max_degree`` distinct
    neighbors emit NO wedges (their 2-hop contribution through that hub
    is dropped — capped results are approximate THROUGH hubs), and the
    dropped-center count lands in ``stats["dropped_centers"]`` when a
    dict is passed. ``max_degree=None`` (the oracle default) is exact
    and byte-identical to the uncapped plan."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def route_orders(df: pd.DataFrame) -> pd.DataFrame:
        return _route(df.drop_duplicates(), "l_orderkey")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        p = m[["l_partkey_a", "l_partkey_b"]].drop_duplicates()
        p.columns = ["x", "y"]
        return p.astype({"x": np.int64, "y": np.int64})

    pairs = (
        li.map_batches(route_orders, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(emit_pairs, batch_format="pandas")
    )

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([x, y]), "dst": np.concatenate([y, x])}
        )

    # edge-scale int table consumed by BOTH exchanges — pin it once
    adj = pairs.map_batches(sym, batch_format="pandas").materialize()

    if max_degree is not None and stats is not None:
        stats["dropped_centers"] = _dropped_centers(adj, max_degree)

    # exchange 1: all of mid m's rows in one group → N(m) × N(m) wedges
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        if max_degree is not None:
            # routing is by src, so a src's FULL distinct-neighbor count
            # is visible here — hub centers drop before the self-merge
            cnt = g.groupby("src", sort=False)["dst"].transform("size")
            g = g[cnt <= max_degree]
        m = g.merge(g, on="src", suffixes=("_a", "_b"))
        m = m[m["dst_a"] != m["dst_b"]]
        out = m[["dst_a", "dst_b"]].drop_duplicates()
        out.columns = ["node", "nb"]
        return out.astype({"node": np.int64, "nb": np.int64})

    cands = (
        adj.map_batches(lambda df: _route(df, "src"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(wedges, batch_format="pandas")
    )

    # exchange 2: candidates ∪ direct-edge markers routed by node →
    # per-group anti-join + distinct count (all rows of a node co-locate)
    def mark(direct: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.rename(columns={"src": "node", "dst": "nb"}).copy()
            out["direct"] = np.int8(direct)
            return _route(out, "node")

        return f

    unioned = cands.map_batches(mark(0), batch_format="pandas").union(
        adj.map_batches(mark(1), batch_format="pandas")
    )

    def count_two_hop(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["direct"] == 0][["node", "nb"]].drop_duplicates()
        d = g[g["direct"] == 1][["node", "nb"]].drop_duplicates()
        keep = c.merge(d, on=["node", "nb"], how="left", indicator=True)
        keep = keep[keep["_merge"] == "left_only"]
        out = keep.groupby("node", sort=False).size().reset_index(name="n_two_hop")
        return pd.DataFrame(
            {
                "node": out["node"].to_numpy(np.int64),
                "n_two_hop": out["n_two_hop"].to_numpy(np.int64),
            }
        )

    return unioned.groupby("_pkey").map_groups(count_two_hop, batch_format="pandas")


SQL_COPURCHASE_TWO_HOP = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
adj AS (SELECT u AS src, v AS dst FROM pairs
        UNION ALL SELECT v AS src, u AS dst FROM pairs),
two AS (
  SELECT DISTINCT a.dst AS node, b.dst AS nb
  FROM adj a JOIN adj b ON a.src = b.src
  WHERE a.dst <> b.dst)
SELECT t.node, CAST(COUNT(*) AS BIGINT) AS n_two_hop
FROM two t LEFT JOIN adj d ON d.src = t.node AND d.dst = t.nb
WHERE d.src IS NULL
GROUP BY t.node
"""


# --- copurchase_local_cc (per-node clustering) -------------------------------


def q_copurchase_local_cc(
    sf_dir: str, max_degree: int | None = None, stats: dict | None = None
):
    """Local clustering coefficient per part: 2·t(v) / (d(v)·(d(v)−1))
    over the co-purchase graph, one row per node (cc = 0 when d < 2).
    KEY IDENTITY making this distributed-cheap: a node's triangle count
    equals the number of CLOSED WEDGES CENTERED AT IT — so the mid-
    routed wedge emission credits each node directly, no ×3 correction
    and no per-triangle vertex unnest. Two exchanges: (1) adjacency by
    MID → (a, b, mid) wedge rows + (mid, degree) rows; (2) wedges ∪
    edge markers by the (a, b) endpoint pair → closure check, credits
    summed per mid co-partitioned with its degree row.

    ``max_degree`` (optional) bounds the per-center quadratic term:
    a node with more than ``max_degree`` distinct neighbors emits
    neither wedges nor its degree row — it is DROPPED from the output
    (never given a wrong cc), with the count exposed via
    ``stats["dropped_centers"]``. Other nodes are unaffected (their cc
    uses wedges centered at themselves). ``max_degree=None`` (the
    oracle default) is exact."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def route_orders(df: pd.DataFrame) -> pd.DataFrame:
        return _route(df.drop_duplicates(), "l_orderkey")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        p = m[["l_partkey_a", "l_partkey_b"]].drop_duplicates()
        p.columns = ["x", "y"]
        return p.astype({"x": np.int64, "y": np.int64})

    # edge-scale int table consumed by the wedge AND marker sides — pin once
    pairs = (
        li.map_batches(route_orders, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(emit_pairs, batch_format="pandas")
    ).materialize()

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([x, y]), "dst": np.concatenate([y, x])}
        )

    adj = pairs.map_batches(sym, batch_format="pandas")

    if max_degree is not None and stats is not None:
        stats["dropped_centers"] = _dropped_centers(adj, max_degree)

    # exchange 1: per mid — degree row (kind 2) + a<b wedge rows (kind 0)
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates()
        if max_degree is not None:
            # capped centers lose BOTH their wedges and their degree row
            # — dropped from the output entirely, never a wrong cc
            cnt = g.groupby("src", sort=False)["dst"].transform("size")
            g = g[cnt <= max_degree]
        deg = g.groupby("src", sort=False).size().reset_index(name="n")
        m = g.merge(g, on="src", suffixes=("_a", "_b"))
        m = m[m["dst_a"] < m["dst_b"]]
        wed = pd.DataFrame(
            {"a": m["dst_a"].to_numpy(np.int64), "b": m["dst_b"].to_numpy(np.int64),
             "mid": m["src"].to_numpy(np.int64), "kind": np.int8(0)}
        )
        dg = pd.DataFrame(
            {"a": deg["src"].to_numpy(np.int64), "b": deg["n"].to_numpy(np.int64),
             "mid": deg["src"].to_numpy(np.int64), "kind": np.int8(2)}
        )
        return pd.concat([wed, dg], ignore_index=True)

    wl = (
        adj.map_batches(lambda df: _route(df, "src"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(wedges, batch_format="pandas")
    )

    # exchange 2: wedges + edge markers by (a, b); degree rows by mid —
    # one union so credits and degrees co-partition with their node
    def route_pairhash(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        kind = out["kind"].to_numpy(np.int8)
        key = np.where(
            kind == 2,
            pd.util.hash_array(out["mid"].to_numpy(np.int64)),
            pd.util.hash_array(out["a"].to_numpy(np.int64)) * np.uint64(31)
            + pd.util.hash_array(out["b"].to_numpy(np.int64)),
        )
        out["_pkey"] = (key % np.uint64(ROUTE_PARTS)).astype(np.int32)
        return out

    def edge_marker(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"a": df["x"].to_numpy(np.int64), "b": df["y"].to_numpy(np.int64),
             "mid": np.int64(-1), "kind": np.int8(1)}
        )
        return out

    def closure_credits(g: pd.DataFrame) -> pd.DataFrame:
        wed = g[g["kind"] == 0]
        edg = g[g["kind"] == 1][["a", "b"]].drop_duplicates()
        hit = wed.merge(edg, on=["a", "b"])
        cred = hit.groupby("mid", sort=False).size().reset_index(name="t")
        return pd.DataFrame(
            {"node": cred["mid"].to_numpy(np.int64),
             "t": cred["t"].to_numpy(np.int64), "kind": np.int8(0)}
        )

    routed = (
        wl.map_batches(route_pairhash, batch_format="pandas")
        .union(
            pairs.map_batches(edge_marker, batch_format="pandas").map_batches(
                route_pairhash, batch_format="pandas"
            )
        )
    )

    # degree rows pass through exchange 2 keyed by mid; credits keyed by
    # (a,b) land elsewhere — a second mid-keyed exchange folds them
    def split_deg(g: pd.DataFrame) -> pd.DataFrame:
        dg = g[g["kind"] == 2]
        out_deg = pd.DataFrame(
            {"node": dg["mid"].to_numpy(np.int64),
             "t": dg["b"].to_numpy(np.int64), "kind": np.int8(2)}
        )
        return pd.concat([closure_credits(g), out_deg], ignore_index=True)

    merged = routed.groupby("_pkey").map_groups(split_deg, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        deg = g[g["kind"] == 2].groupby("node", sort=False)["t"].sum()
        tri = g[g["kind"] == 0].groupby("node", sort=False)["t"].sum()
        nodes = deg.index.to_numpy(np.int64)
        d = deg.to_numpy(np.int64)
        t = tri.reindex(deg.index, fill_value=0).to_numpy(np.int64)
        cc = np.where(d >= 2, 2.0 * t / np.maximum(d * (d - 1), 1), 0.0)
        return pd.DataFrame(
            {"node": nodes, "degree": d, "n_tri": t,
             "local_cc": cc.astype(np.float64)}
        )

    return (
        merged.map_batches(lambda df: _route(df, "node"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(fold, batch_format="pandas")
    )


SQL_COPURCHASE_LOCAL_CC = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
tv AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri),
tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM tv GROUP BY node)
SELECT d.node, d.d AS degree, COALESCE(tc.t, 0) AS n_tri,
       CASE WHEN d.d >= 2
            THEN 2.0 * COALESCE(tc.t, 0) / (d.d * (d.d - 1))
            ELSE 0.0 END AS local_cc
FROM deg d LEFT JOIN tc USING (node)
"""


# --- repeat_buyers (INTERSECT) ----------------------------------------------

BUYER_YEAR_A = 1995
BUYER_YEAR_B = 1996


def q_repeat_buyers(sf_dir: str):
    """Customers with ≥1 order in BOTH years — set INTERSECT as a
    bitmask combiner: each batch contributes distinct (custkey, bit)
    rows (bit 1 = year A, bit 2 = year B), one custkey-routed exchange
    ORs the bits, mask == 3 survives. The customer universe moves as
    (int64, int8) rows exactly once."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        yr = np.asarray(pc.year(t["o_orderdate"].combine_chunks()))
        ck = np.asarray(t["o_custkey"].combine_chunks(), np.int64)
        m = np.where(yr == BUYER_YEAR_A, 1, np.where(yr == BUYER_YEAR_B, 2, 0)).astype(np.int8)
        df = pd.DataFrame({"custkey": ck[m > 0], "bit": m[m > 0]})
        g = df.groupby("custkey", sort=False)["bit"].agg(lambda s: np.bitwise_or.reduce(s.to_numpy()))
        out = g.reset_index()
        out["bit"] = out["bit"].astype("int8")
        return _route(out, "custkey")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("custkey", sort=False)["bit"].agg(
            lambda s: np.bitwise_or.reduce(s.to_numpy())
        )
        keep = m[m == 3].index.to_numpy(np.int64)
        return pd.DataFrame({"custkey": np.sort(keep)})

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


SQL_REPEAT_BUYERS = f"""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = {BUYER_YEAR_A}
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = {BUYER_YEAR_B}
"""

# --- orders_status_pivot (conditional-aggregation pivot) ---------------------

_STATUSES = ("F", "O", "P")


def q_orders_status_pivot(sf_dir: str):
    """One row per order year with per-status order counts and revenue
    cents as COLUMNS (the CASE/FILTER pivot). Per-batch partial pivot
    (years × 3 statuses rows), one year-keyed vectorized merge."""
    orders = _t(sf_dir, "orders", ["o_orderdate", "o_orderstatus", "o_totalprice"])
    cols = [f"n_{s.lower()}" for s in _STATUSES] + [
        f"rev_{s.lower()}_cents" for s in _STATUSES
    ]

    def partial(t: pa.Table) -> pd.DataFrame:
        yr = np.asarray(pc.year(t["o_orderdate"].combine_chunks()), np.int64)
        st = t["o_orderstatus"].to_pylist()
        cents = np.asarray(_cents(t["o_totalprice"]), np.int64)
        df = pd.DataFrame({"yr": yr, "st": st, "cents": cents})
        rows = []
        for y, g in df.groupby("yr", sort=False):
            row = {"yr": y}
            for s in _STATUSES:
                sel = g[g["st"] == s]
                row[f"n_{s.lower()}"] = np.int64(len(sel))
                row[f"rev_{s.lower()}_cents"] = np.int64(sel["cents"].sum())
            rows.append(row)
        res = pd.DataFrame(rows, columns=["yr", *cols]).astype("int64")
        return _route(res, "yr")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("yr", sort=False)[cols].sum().reset_index()
        return out.astype("int64")

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


SQL_ORDERS_STATUS_PIVOT = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p,
       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
            FILTER (o_orderstatus = 'F'), 0) AS BIGINT) AS rev_f_cents,
       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
            FILTER (o_orderstatus = 'O'), 0) AS BIGINT) AS rev_o_cents,
       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
            FILTER (o_orderstatus = 'P'), 0) AS BIGINT) AS rev_p_cents
FROM orders GROUP BY yr
"""

# --- vector_range_count (cosine radius search) --------------------------------

RANGE_TAU = 0.2
RANGE_QUERY_IDS = (0, 1, 2)


def q_vector_range_count(sf_dir: str):
    """For each query vector, how many corpus vectors lie within cosine
    radius ``RANGE_TAU`` (query included — cos = 1). The query matrix is
    3 vectors (closure-shipped — bytes, not a dim table); each batch is
    one (batch × 3) matmul producing int partial counts; the merge is a
    3-row sum. Counts (not similarities) are the output precisely so the
    oracle comparison is integer-exact despite DuckDB's float32 cosine."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    qt = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qsel = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array(RANGE_QUERY_IDS)))
    order = np.argsort(np.asarray(qsel["vec_id"].combine_chunks()))
    qm = np.array(qsel["embedding"].to_pylist(), dtype=np.float64)[order]
    qids = np.asarray(qsel["vec_id"].combine_chunks())[order]
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    emb = _t(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ qn.T) / np.where(norms == 0, 1, norms)[:, None]
        n = (sims >= RANGE_TAU).sum(axis=0).astype(np.int64)
        return pd.DataFrame({"q_vec_id": qids.astype(np.int64), "n_within": n})

    parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("q_vec_id", sort=True)["n_within"].sum().reset_index()
    return out.astype({"q_vec_id": "int64", "n_within": "int64"})


SQL_VECTOR_RANGE = f"""
SELECT q.vec_id AS q_vec_id, CAST(COUNT(*) AS BIGINT) AS n_within
FROM embeddings e, embeddings q
WHERE q.vec_id IN {RANGE_QUERY_IDS}
  AND list_cosine_similarity(e.embedding, q.embedding) >= {RANGE_TAU}
GROUP BY q.vec_id
ORDER BY q_vec_id
"""


# --- knn_graph (exact k-NN graph construction) -------------------------------


def q_knn_graph(sf_dir: str):
    """The exact cosine 5-NN graph over the embeddings table —
    ``(vec_id, nn_id, rank)`` for every vector, self excluded, ties →
    smaller neighbor id. Engine side = ``ops/similarity.knn_join_exact``
    (one broadcast of the corpus matrix + one matmul per batch);
    ``knn_graph_ivf`` is the no-broadcast bucketed scale path, verified
    against this exact output by recall tests."""
    import os as _os

    import pandas as _pd
    import ray.data as _rd

    from ..ops.similarity import knn_join_exact

    emb = _rd.read_parquet(
        _os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    # dtype casts stay per-batch — the k·n edge table never lands on the driver
    def cast(df: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame(
            {
                "vec_id": df["vec_id"].astype("int64"),
                "nn_id": df["nn_id"].astype("int64"),
                "rank": df["rank"].astype("int64"),
            }
        )

    return knn_join_exact(emb, k=5).map_batches(cast, batch_format="pandas")


SQL_KNN_GRAPH = """
WITH s AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (SELECT vec_id, nn_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, nn_id) - 1 AS rank
      FROM s)
SELECT vec_id, nn_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank < 5
"""


QUERIES_GRAPH = {
    "copurchase_triangles": q_copurchase_triangles,
    "copurchase_two_hop": q_copurchase_two_hop,
    "copurchase_local_cc": q_copurchase_local_cc,
    "repeat_buyers": q_repeat_buyers,
    "orders_status_pivot": q_orders_status_pivot,
    "vector_range_count": q_vector_range_count,
    "knn_graph": q_knn_graph,
}

ORACLE_SQL_GRAPH = {
    "copurchase_triangles": SQL_COPURCHASE_TRIANGLES,
    "copurchase_two_hop": SQL_COPURCHASE_TWO_HOP,
    "copurchase_local_cc": SQL_COPURCHASE_LOCAL_CC,
    "repeat_buyers": SQL_REPEAT_BUYERS,
    "orders_status_pivot": SQL_ORDERS_STATUS_PIVOT,
    "vector_range_count": SQL_VECTOR_RANGE,
    "knn_graph": SQL_KNN_GRAPH,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_GRAPH)
_MAIN_SQL.update(ORACLE_SQL_GRAPH)
