"""Sequence / funnel-lag / statistics / degree-distribution battery —
four operator shapes no earlier battery covers, each DuckDB-oracle-
checked:

- ``event_transitions``: the Markov transition matrix over per-user
  event streams (LEAD window → global (from, to) counts) — the
  session-modelling primitive behind next-action prediction features.
- ``conversion_lag``: per-user seconds from first 'signup' to first
  'purchase' — the funnel-latency shape (multi-predicate MIN combiner,
  FILTER semantics) every product-analytics pipeline runs.
- ``corr_qty_discount``: distributed Pearson correlation per group from
  EXACT integer sufficient statistics — the engine ships five BIGINT
  sums per (batch, group) and evaluates one double formula on the
  group-scale result, mirrored token-for-token in the SQL so both sides
  produce bit-identical IEEE doubles (no streaming-float divergence).
- ``copurchase_degree_hist``: degree distribution of the part
  co-purchase graph — the graph-shape diagnostic (hub detection, LSH
  bucket-cap calibration) next to ``copurchase_triangles``.
- ``urgent_lineitem_revenue``: selective semi-join through the Bloom
  prefilter primitive (``ops/bloom.bloom_semi_join``) — non-candidate
  fact rows never reach the exchange.

Reference analog: the aggregate/diagnostic query family
(``blarify/db_managers/queries.py``); re-expressed as distributed Ray
Data exchanges. Self-registers into ``analytics.QUERIES/ORACLE_SQL`` at
the bottom, same contract as analytics_ext/analytics_win/
analytics_rank/analytics_cohort/analytics_graph. NOTE: helpers from
other battery modules must be imported INSIDE functions (worker-side
circular import; see analytics_win's note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import ROUTE_PARTS, _round_half_away, _route, _t

# --- event_transitions (per-user consecutive event-type pairs) ---------------


def q_event_transitions(sf_dir: str):
    """Global counts of consecutive (from_type → to_type) event pairs,
    consecutive per user in (ts, event_id) order.

    Scale shape: ONE user-keyed exchange of (user, ts, event_id, type)
    rows; each hash partition owns whole users, so the sort + shifted
    pair construction is partition-local and vectorized (no per-user
    Python loop); the final exchange is transition-matrix-scale
    (|types|² rows)."""
    from ray.data.aggregate import Sum

    ev = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts": df["ts"].astype("int64").to_numpy(),
                "event_id": df["event_id"].to_numpy(np.int64),
                "et": df["event_type"].astype(str),
            }
        )
        return _route(out, "user_id")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        et = g["et"].to_numpy(object)
        same = u[1:] == u[:-1]
        pairs = pd.DataFrame(
            {"from_type": et[:-1][same], "to_type": et[1:][same]}
        )
        c = (
            pairs.groupby(["from_type", "to_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        c["n"] = c["n"].astype(np.int64)
        return c

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n_transitions"))
    )


SQL_EVENT_TRANSITIONS = """
WITH nxt AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM nxt WHERE to_type IS NOT NULL
GROUP BY 1, 2
"""

# --- conversion_lag (first signup → first purchase per user) ------------------


def q_conversion_lag(sf_dir: str):
    """Per-user funnel latency: whole seconds from the user's FIRST
    'signup' event to their FIRST 'purchase' event; users missing
    either, or purchasing before signing up, are dropped.

    Scale shape: per-batch (user, type) MIN partials over only the two
    relevant types → ONE user-keyed exchange; the merge re-mins and
    pivots partition-locally (whole users per partition); output is
    converted-user-scale."""
    ev = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["event_type"].isin(["signup", "purchase"])]
        g = (
            m.groupby(["user_id", "event_type"], sort=False)["ts"]
            .min()
            .reset_index()
        )
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "et": g["event_type"].astype(str),
                "ts": g["ts"].astype("int64").to_numpy(),
            }
        )
        return _route(out, "user_id")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mn = g.groupby(["user_id", "et"], sort=False)["ts"].min().reset_index()
        s = mn[mn["et"] == "signup"].set_index("user_id")["ts"]
        p = mn[mn["et"] == "purchase"].set_index("user_id")["ts"]
        both = s.index.intersection(p.index)
        su = s.loc[both].to_numpy(np.int64)
        pu = p.loc[both].to_numpy(np.int64)
        keep = pu >= su
        return pd.DataFrame(
            {
                "user_id": both.to_numpy(np.int64)[keep],
                # floor-divide the µs DIFFERENCE (matches SQL's
                # (epoch_us(p) - epoch_us(s)) // 1e6, not a diff of floors)
                "lag_s": ((pu[keep] - su[keep]) // 1_000_000).astype(np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


SQL_CONVERSION_LAG = """
WITH m AS (
  SELECT user_id,
         MIN(ts) FILTER (WHERE event_type = 'signup') AS s,
         MIN(ts) FILTER (WHERE event_type = 'purchase') AS p
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST((epoch_us(p) - epoch_us(s)) // 1000000 AS BIGINT) AS lag_s
FROM m
WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s
"""

# --- corr_qty_discount (exact-sufficient-statistics Pearson) ------------------


def q_corr_qty_discount(sf_dir: str):
    """Pearson correlation of quantity vs discount per returnflag,
    computed from EXACT integer sufficient statistics: each batch ships
    five BIGINT sums per group (n, Σx, Σy, Σx², Σy², Σxy over integral
    quantity and discount-percent), the group-scale merge re-sums, and
    ONE double formula evaluates on the driver — token-identical to the
    oracle SQL, so both sides produce bit-equal IEEE doubles (a
    streaming-float corr() would not hash-match). Integer bounds: safe
    through ~1e9 rows/group (n·Σx² < 2⁶³); beyond that the partials
    would need a second-level split.

    Scale shape: pure combiner — the exchange is groups-scale, raw
    columns never shuffle."""
    from ray.data.aggregate import Sum

    li = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = _round_half_away(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        y = _round_half_away(
            df["l_discount"].to_numpy(np.float64) * 100
        ).astype(np.int64)
        t = pd.DataFrame(
            {
                "flag": df["l_returnflag"].astype(str),
                "n": np.ones(len(df), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        return t.groupby("flag", sort=False).sum().reset_index()

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("flag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()  # groups-scale (|returnflag| rows)
    )
    nd = agg["n"].to_numpy(np.float64)
    sx = agg["sx"].to_numpy(np.float64)
    sy = agg["sy"].to_numpy(np.float64)
    sxx = agg["sxx"].to_numpy(np.float64)
    syy = agg["syy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    corr = (nd * sxy - sx * sy) / np.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return pd.DataFrame(
        {
            "l_returnflag": agg["flag"].astype(str),
            "corr_qty_disc": corr.astype(np.float64),
        }
    ).sort_values("l_returnflag").reset_index(drop=True)


SQL_CORR_QTY_DISCOUNT = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS corr_qty_disc
FROM s
"""

# --- copurchase_degree_hist (graph degree distribution) -----------------------


def _route_pair(p: pd.DataFrame) -> pd.DataFrame:
    """Pair-hash routing (same formula as parts_bought_together): every
    occurrence of an (x, y) pair — from whichever order partition — lands
    in ONE partition, so global pair dedup is partition-local."""
    p = p.copy(deep=False)
    p["_pkey"] = (
        (
            pd.util.hash_array(p["x"].to_numpy()) * np.uint64(31)
            + pd.util.hash_array(p["y"].to_numpy())
        )
        % ROUTE_PARTS
    ).astype("int32")
    return p


def q_copurchase_degree_hist(sf_dir: str):
    """Degree distribution of the part co-purchase graph (parts linked
    iff bought in one order): for every degree d, how many parts have
    exactly d distinct co-purchase partners — the hub/skew diagnostic
    next to ``copurchase_triangles``.

    Scale shape: basket pairs emit via the order-co-partitioned
    self-merge (ids only), re-route by PAIR hash for exact global dedup
    (same pair from different orders → same partition), incidence
    partials re-route by PART (whole parts per partition → exact
    degrees), and the final exchange is histogram-scale."""
    from ray.data.aggregate import Sum

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def route_order(df: pd.DataFrame) -> pd.DataFrame:
        return _route(df.drop_duplicates(), "l_orderkey")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        p = m[["l_partkey_a", "l_partkey_b"]].drop_duplicates()
        p.columns = ["x", "y"]
        return _route_pair(p.astype({"x": np.int64, "y": np.int64}))

    def dedup_incidence(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["x", "y"])
        parts = np.concatenate(
            [g["x"].to_numpy(np.int64), g["y"].to_numpy(np.int64)]
        )
        c = pd.Series(parts).value_counts()
        out = pd.DataFrame(
            {
                "part": c.index.to_numpy(np.int64),
                "deg": c.to_numpy(np.int64),
            }
        )
        return _route(out, "part")

    def degree_hist(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("part", sort=False)["deg"].sum()
        h = d.value_counts()
        return pd.DataFrame(
            {
                "degree": h.index.to_numpy(np.int64),
                "n_parts": h.to_numpy(np.int64),
            }
        )

    return (
        li.map_batches(route_order, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(dedup_incidence, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(degree_hist, batch_format="pandas")
        .groupby("degree")
        .aggregate(Sum("n_parts", alias_name="n_parts"))
    )


SQL_COPURCHASE_DEGREE_HIST = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey),
deg AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT x AS part FROM pairs UNION ALL SELECT y AS part FROM pairs)
  GROUP BY part)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM deg GROUP BY degree
"""


# --- urgent_lineitem_revenue (Bloom-prefiltered semi-join) --------------------


def q_urgent_lineitem_revenue(sf_dir: str):
    """Revenue by returnflag over only the lineitems of URGENT orders —
    the selective-semi-join shape, executed through the Bloom primitive
    (``ops/bloom.bloom_semi_join``): urgent order keys fold into a
    blob-scale filter broadcast once, a map-only pass drops every
    non-candidate lineitem BEFORE the exchange, and one co-partitioned
    marker join resolves the filter's false positives exactly. At a
    selective predicate the exchange ships ~(matches + FP%·rows)
    instead of the whole fact table."""
    from ray.data.aggregate import Sum

    from ..ops.bloom import bloom_semi_join

    li = _t(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    urgent = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda df: df[df["o_orderpriority"] == "1-URGENT"][["o_orderkey"]],
        batch_format="pandas",
    )
    semi = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1 - df["l_discount"].to_numpy(np.float64))
            * 100
        ).astype(np.int64)
        g = (
            pd.DataFrame({"l_returnflag": df["l_returnflag"].astype(str), "c": cents})
            .groupby("l_returnflag", sort=False)["c"]
            .sum()
            .reset_index()
        )
        return g.rename(columns={"c": "revenue_cents"})

    return (
        semi.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


SQL_URGENT_LINEITEM_REVENUE = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""




# --- copurchase_assortativity (degree-degree correlation) --------------------


def q_copurchase_assortativity(sf_dir: str):
    """Degree assortativity of the part co-purchase graph: the Pearson
    correlation between the degrees at the two ends of every edge (both
    directions, the standard Newman definition) — one number telling
    whether hubs link to hubs (> 0) or to leaves (< 0), next to the
    degree histogram and triangle census.

    Scale shape: distinct pairs and exact degrees reuse the
    degree-histogram plan (order-co-partitioned pair emission, pair-keyed
    global dedup, part-keyed degrees); the two endpoint degrees attach by
    co-partitioned lookups, and everything after is five exact int64
    sufficient-statistic sums whose double formula is token-identical to
    the SQL (bit-equal IEEE output — the ``corr_qty_discount``
    discipline)."""
    from ..ops.joins import copartition_attach
    from ..util import compact_nonempty

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def route_order(df: pd.DataFrame) -> pd.DataFrame:
        return _route(df.drop_duplicates(), "l_orderkey")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        p = m[["l_partkey_a", "l_partkey_b"]].drop_duplicates()
        p.columns = ["x", "y"]
        return _route_pair(p.astype({"x": np.int64, "y": np.int64}))

    pairs = compact_nonempty(
        li.map_batches(route_order, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g.drop_duplicates(["x", "y"])[["x", "y"]],
            batch_format="pandas",
        )
    ).materialize()

    def inc_partial(df: pd.DataFrame) -> pd.DataFrame:
        parts_ = np.concatenate(
            [df["x"].to_numpy(np.int64), df["y"].to_numpy(np.int64)]
        )
        c = pd.Series(parts_).value_counts()
        out = pd.DataFrame(
            {"part": c.index.to_numpy(np.int64), "deg": c.to_numpy(np.int64)}
        )
        return _route(out, "part")

    deg = compact_nonempty(
        pairs.map_batches(inc_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g.groupby("part", sort=False)["deg"].sum().reset_index(),
            batch_format="pandas",
        )
    )

    both = copartition_attach(
        copartition_attach(pairs, deg, "x", "part", {"deg": "dx"}, how="inner"),
        deg, "y", "part", {"deg": "dy"}, how="inner",
    )

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        dx = df["dx"].to_numpy(np.int64)
        dy = df["dy"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n": [np.int64(2 * len(df))],
                "sa": [np.int64(dx.sum() + dy.sum())],
                "sab": [np.int64(2 * (dx * dy).sum())],
                "saa": [np.int64((dx * dx).sum() + (dy * dy).sum())],
                "n_pairs": [np.int64(len(df))],
            }
        )

    stats = both.map_batches(stat_partial, batch_format="pandas")
    n = int(stats.sum("n") or 0)
    sa = int(stats.sum("sa") or 0)
    sab = int(stats.sum("sab") or 0)
    saa = int(stats.sum("saa") or 0)
    n_pairs = int(stats.sum("n_pairs") or 0)
    # symmetric edge list: sb == sa, sbb == saa; formula token-identical
    # to the SQL so the double is bit-equal
    num = float(n) * float(sab) - float(sa) * float(sa)
    den = np.sqrt(float(n) * float(saa) - float(sa) * float(sa)) * np.sqrt(
        float(n) * float(saa) - float(sa) * float(sa)
    )
    # keep the IEEE result (NaN/inf) bit-identical to the SQL's double
    # division — just without numpy's RuntimeWarning on degenerate input
    with np.errstate(invalid="ignore", divide="ignore"):
        val = num / den
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_pairs], dtype="int64"),
            "assortativity": pd.Series([val], dtype="float64"),
        }
    )


SQL_COPURCHASE_ASSORTATIVITY = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey),
deg AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT x AS part FROM pairs UNION ALL SELECT y AS part FROM pairs)
  GROUP BY part),
e AS (
  SELECT d1.degree AS a, d2.degree AS b
  FROM pairs JOIN deg d1 ON pairs.x = d1.part JOIN deg d2 ON pairs.y = d2.part),
sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a) AS BIGINT) AS sa,
             CAST(SUM(a*b) AS BIGINT) AS sab,
             CAST(SUM(a*a) AS BIGINT) AS saa
      FROM sym)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)))
         AS assortativity
FROM s
"""


QUERIES_SEQ = {
    "event_transitions": q_event_transitions,
    "conversion_lag": q_conversion_lag,
    "corr_qty_discount": q_corr_qty_discount,
    "copurchase_degree_hist": q_copurchase_degree_hist,
    "urgent_lineitem_revenue": q_urgent_lineitem_revenue,
    "copurchase_assortativity": q_copurchase_assortativity,
}

ORACLE_SQL_SEQ = {
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "conversion_lag": SQL_CONVERSION_LAG,
    "corr_qty_discount": SQL_CORR_QTY_DISCOUNT,
    "copurchase_degree_hist": SQL_COPURCHASE_DEGREE_HIST,
    "urgent_lineitem_revenue": SQL_URGENT_LINEITEM_REVENUE,
    "copurchase_assortativity": SQL_COPURCHASE_ASSORTATIVITY,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_SEQ)
_MAIN_SQL.update(ORACLE_SQL_SEQ)
