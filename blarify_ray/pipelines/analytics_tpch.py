"""Decision-support composition battery — four more TPC-H-shaped
operator forms no earlier battery covers, each DuckDB-oracle-checked:

- ``late_orders_by_priority``: correlated EXISTS semi-join (TPC-H Q4)
  — orders with ≥1 late line, counted per priority — resolved in ONE
  orderkey-keyed exchange ("any line late" merges as a MAX partial).
- ``small_qty_revenue``: correlated per-group scalar THRESHOLD (TPC-H
  Q17) — lines under 20 % of their part's average quantity — with the
  comparison rewritten in exact integer math (``5·qty·n < Σqty``) so
  the engine and the oracle agree bit-for-bit.
- ``idle_rich_customers``: scalar-subquery comparison + NOT-EXISTS
  anti-join (TPC-H Q22) — above-average balances among customers with
  no orders — the average compare also done as exact integer
  cross-multiplication (``cents·n > Σcents``), never a float
  threshold.
- ``nation_market_share``: four-way dimensional join + conditional
  share-of-total (TPC-H Q8) — one supplier-keyed attach, one
  customer-keyed attach, one orderkey exchange; the share divides two
  exact integer sums, so the double output is deterministic.

Reference analog: the aggregate/diagnostic query family
(``blarify/db_managers/queries.py``), re-expressed as distributed Ray
Data exchanges. Self-registers into ``analytics.QUERIES/ORACLE_SQL`` at
the bottom, same contract as the other batteries. NOTE: helpers from
other battery modules must be imported INSIDE functions (worker-side
circular import; see analytics_win's note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analytics import _round_half_away, _route, _t

_US_60D = 60 * 86_400_000_000

# --- late_orders_by_priority (Q4 correlated EXISTS) --------------------------


def q_late_orders_by_priority(sf_dir: str):
    """Per order priority: how many orders have AT LEAST ONE lineitem
    shipped more than 60 days after the order date — TPC-H Q4's
    correlated EXISTS shape.

    Scale shape: EXISTS collapses to a per-order MAX — "any line late"
    ≡ "latest ship date late" — so lineitem reduces per batch to
    (order → max shipdate) partials and moves through ONE orderkey-keyed
    exchange together with the (order, date, priority) rows; the flag
    resolves vectorized per partition and only priority-scale counts
    reach the final aggregate."""
    from ray.data.aggregate import Sum

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "okey": df["o_orderkey"].to_numpy(np.int64),
                "us": np.full(len(df), -1, np.int64),
                "odate": df["o_orderdate"].astype("int64").to_numpy(),
                "prio": df["o_orderpriority"].astype(str),
            }
        )
        return _route(out, "okey")

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "okey": df["l_orderkey"].to_numpy(np.int64),
                    "us": df["l_shipdate"].astype("int64").to_numpy(),
                }
            )
            .groupby("okey", sort=False)["us"]
            .max()
            .reset_index()
        )
        g["odate"] = np.int64(-1)
        g["prio"] = ""
        return _route(g, "okey")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        li_g = g[g["odate"] < 0]
        o_g = g[g["odate"] >= 0]
        mx = li_g.groupby("okey", sort=False)["us"].max().reset_index()
        m = o_g[["okey", "odate", "prio"]].merge(mx, on="okey", how="inner")
        hit = m[m["us"].to_numpy() > m["odate"].to_numpy() + _US_60D]
        out = hit.groupby("prio", sort=False).size().reset_index(name="n")
        return pd.DataFrame(
            {
                "o_orderpriority": out["prio"].astype(str),
                "n_orders": out["n"].to_numpy(np.int64),
            }
        )

    merged = (
        li.map_batches(li_partial, batch_format="pandas")
        .union(orders.map_batches(o_rows, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(resolve, batch_format="pandas")
    )
    return merged.groupby("o_orderpriority").aggregate(
        Sum("n_orders", alias_name="n_orders")
    )


SQL_LATE_ORDERS_BY_PRIORITY = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""


# --- small_qty_revenue (Q17 correlated scalar threshold) ---------------------

_Q17_BRAND = "Brand#11"


def q_small_qty_revenue(sf_dir: str):
    """Total extended price (in cents, scaled by 1/7 — Q17's
    "avg yearly") of lineitems for one brand's parts whose quantity is
    under 20 % of that part's average lineitem quantity.

    Scale shape: the brand's partkey set (a ~1/25 slice of the part
    dimension) broadcasts once via ``ray.put``; pass 1 reduces the
    brand-filtered lineitem to (partkey → Σqty, n) per-batch partials
    through one partkey-keyed exchange (quantities are integral, so the
    sums are exact int64); the per-part threshold broadcasts back at
    the same brand-part scale and pass 2 is a map-only filter + SUM.
    The 20 % compare is exact integer cross-multiplication
    (``5·qty·n < Σqty``) — no float threshold for the oracle to
    disagree with."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..util import get_broadcast

    part = _t(sf_dir, "part", ["p_partkey", "p_brand"])
    # take_all keeps the empty case well-typed (an all-empty Dataset
    # loses its columns through to_pandas) — a corpus without the brand
    # must produce the SQL's NULL row, not a KeyError
    brand_rows = part.map_batches(
        lambda t: pa.Table.from_pydict(
            {"p_partkey": t.filter(pc.equal(t["p_brand"], _Q17_BRAND))["p_partkey"]}
        ),
        batch_format="pyarrow",
    ).take_all()  # brand-part scale
    brand_keys = np.sort(np.asarray([r["p_partkey"] for r in brand_rows], np.int64))
    keys_ref = _ray.put(brand_keys)
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = get_broadcast(keys_ref)
        pk = df["l_partkey"].to_numpy(np.int64)
        mask = np.isin(pk, keys)
        sub = pd.DataFrame(
            {"pkey": pk[mask], "qty": df["l_quantity"].to_numpy(np.float64)[mask].astype(np.int64)}
        )
        g = sub.groupby("pkey", sort=False)["qty"].agg(["sum", "size"]).reset_index()
        g.columns = ["pkey", "s", "n"]
        return _route(g, "pkey")

    def qty_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pkey", sort=False)[["s", "n"]].sum().reset_index()
        return out[["pkey", "s", "n"]]

    stat_rows = (
        li.map_batches(qty_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(qty_merge, batch_format="pandas")
        .take_all()  # brand-part scale; well-typed even when empty
    )
    stat_rows.sort(key=lambda r: r["pkey"])
    stats_ref = _ray.put(
        (
            np.asarray([r["pkey"] for r in stat_rows], np.int64),
            np.asarray([r["s"] for r in stat_rows], np.int64),
            np.asarray([r["n"] for r in stat_rows], np.int64),
        )
    )

    def cents_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, s_arr, n_arr = get_broadcast(stats_ref)
        pk = df["l_partkey"].to_numpy(np.int64)
        qty = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        if len(keys):
            idx = np.searchsorted(keys, pk).clip(0, len(keys) - 1)
            valid = keys[idx] == pk
        else:
            idx = np.zeros(len(pk), np.int64)
            valid = np.zeros(len(pk), bool)
        s = np.where(valid, s_arr[idx] if len(keys) else 0, 0)
        n = np.where(valid, n_arr[idx] if len(keys) else 0, 0)
        keep = (n > 0) & (5 * qty * n < s)
        cents = _round_half_away(
            df["l_extendedprice"].to_numpy(np.float64)[keep] * 100
        )
        return pd.DataFrame({"c": [int(cents.sum())], "m": [int(keep.sum())]})

    parts = li.map_batches(cents_partial, batch_format="pandas").take_all()
    total = sum(r["c"] for r in parts)
    m = sum(r["m"] for r in parts)
    if m == 0:
        # SUM over zero qualifying rows is NULL in SQL (a float64 NaN in
        # the oracle's frame) — not 0
        return pd.DataFrame({"avg_yearly_cents": pd.Series([np.nan], dtype="float64")})
    return pd.DataFrame(
        {"avg_yearly_cents": pd.Series([_round_half_away(np.array([total / 7.0]))[0]], dtype="int64")}
    )


SQL_SMALL_QTY_REVENUE = """
WITH a AS (
  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11' GROUP BY 1)
SELECT CAST(ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 7.0)
            AS BIGINT) AS avg_yearly_cents
FROM lineitem JOIN a USING (l_partkey)
WHERE 5 * CAST(l_quantity AS BIGINT) * a.n < a.s
"""


# --- idle_rich_customers (Q22 scalar compare + NOT EXISTS) -------------------


_Q22_CUTOFF = np.datetime64("1999-01-01", "us")


def q_idle_rich_customers(sf_dir: str):
    """Per nation: count + total balance of customers whose balance is
    above the average POSITIVE balance and who placed no RECENT order
    (none since 1999-01-01) — TPC-H Q22's scalar-subquery + NOT-EXISTS
    shape.

    Scale shape: the global average is two int64 partials (Σcents, n)
    — one tiny sum; the buyer key set derives distributed (per-batch
    unique → one distinct aggregate) and broadcasts once; the final
    pass is one map-only filter using exact integer cross-multiplication
    (``cents·n > Σcents``) + nation-scale count/sum partials. The
    customer table never reaches the driver."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..util import get_broadcast

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(df["c_acctbal"].to_numpy(np.float64) * 100)
        pos = cents[cents > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    bals = cust.map_batches(bal_partial, batch_format="pandas")
    s_pos = int(bals.sum("s") or 0)
    n_pos = int(bals.sum("n") or 0)

    uq = (
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "k": pc.unique(
                        t.filter(
                            pc.greater_equal(t["o_orderdate"], _Q22_CUTOFF)
                        )["o_custkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .unique("k")
    )
    # unique() returns None when no order clears the cutoff — every
    # customer is then a non-buyer, not a crash
    buyers = np.sort(np.asarray(uq if uq is not None else [], dtype=np.int64))
    buyers_ref = _ray.put(buyers)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        bk = get_broadcast(buyers_ref)
        cents = _round_half_away(df["c_acctbal"].to_numpy(np.float64) * 100)
        ck = df["c_custkey"].to_numpy(np.int64)
        keep = (cents * n_pos > s_pos) & ~np.isin(ck, bk)
        sub = pd.DataFrame(
            {
                "nation": df["c_nationkey"].to_numpy(np.int64)[keep],
                "cents": cents[keep],
            }
        )
        g = sub.groupby("nation", sort=False)["cents"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame(
            {
                "nation": g["nation"].to_numpy(np.int64),
                "n_cust": g["size"].to_numpy(np.int64),
                "total_bal_cents": g["sum"].to_numpy(np.int64),
            }
        )

    return (
        cust.map_batches(finish, batch_format="pandas")
        .groupby("nation")
        .aggregate(
            Sum("n_cust", alias_name="n_cust"),
            Sum("total_bal_cents", alias_name="total_bal_cents"),
        )
    )


SQL_IDLE_RICH_CUSTOMERS = """
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sm
  FROM customer WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > 0)
SELECT CAST(c_nationkey AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT)
         AS total_bal_cents
FROM customer, s
WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * s.n > s.sm
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""


# --- nation_market_share (Q8 dimensional share-of-total) ---------------------

_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_7"


def q_nation_market_share(sf_dir: str):
    """Per order year, NATION_7 suppliers' share of the revenue
    (price·(1−discount)) on orders placed by ASIA-region customers —
    TPC-H Q8's market-share shape: two dimension attaches + a
    conditional share-of-total.

    Scale shape: nation/region are tiny driver lookups; supplier and
    customer attach by co-partitioned joins (each side moves once);
    lineitem reduces to (order → total_cents, nation_cents) partials
    and meets the in-region (order, year) rows in ONE orderkey-keyed
    exchange; the final aggregate is year-scale. The share divides two
    exact int64 sums, so the double is bit-deterministic."""
    from ray.data.aggregate import Sum

    from ..ops.joins import copartition_attach

    nat = _t(sf_dir, "nation", None).to_pandas()
    reg = _t(sf_dir, "region", None).to_pandas()
    # missing dimension values degrade like the SQL's joins instead of
    # raising: no region → no in-region orders (empty result); no target
    # nation → numerator 0 (share-0.0 rows), via a sentinel key
    rk = reg.loc[reg["r_name"] == _Q8_REGION, "r_regionkey"]
    region_nations = (
        set(nat[nat["n_regionkey"] == int(rk.iloc[0])]["n_nationkey"].astype(int))
        if len(rk)
        else set()
    )
    tn = nat.loc[nat["n_name"] == _Q8_NATION, "n_nationkey"]
    target_nation = int(tn.iloc[0]) if len(tn) else -1

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_n = copartition_attach(
        li, supp, "l_suppkey", "s_suppkey", {"s_nationkey": "snat"}, how="inner"
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 100
        )
        isnat = (df["snat"].to_numpy(np.int64) == target_nation).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "okey": df["l_orderkey"].to_numpy(np.int64),
                    "total": cents,
                    "nation": cents * isnat,
                }
            )
            .groupby("okey", sort=False)[["total", "nation"]]
            .sum()
            .reset_index()
        )
        g["year"] = np.int64(-1)
        return _route(g, "okey")

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o_n = copartition_attach(
        orders, cust, "o_custkey", "c_custkey", {"c_nationkey": "cnat"}, how="inner"
    )

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["cnat"].astype(np.int64).isin(region_nations).to_numpy()
        sub = df[keep]
        out = pd.DataFrame(
            {
                "okey": sub["o_orderkey"].to_numpy(np.int64),
                "total": np.zeros(keep.sum(), np.int64),
                "nation": np.zeros(keep.sum(), np.int64),
                "year": pd.to_datetime(sub["o_orderdate"]).dt.year.to_numpy(np.int64),
            }
        )
        return _route(out, "okey")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        li_g = g[g["year"] < 0]
        o_g = g[g["year"] >= 0]
        agg = li_g.groupby("okey", sort=False)[["total", "nation"]].sum().reset_index()
        m = o_g[["okey", "year"]].merge(agg, on="okey", how="inner")
        out = m.groupby("year", sort=False)[["total", "nation"]].sum().reset_index()
        return pd.DataFrame(
            {
                "o_year": out["year"].to_numpy(np.int64),
                "nation_cents": out["nation"].to_numpy(np.int64),
                "total_cents": out["total"].to_numpy(np.int64),
            }
        )

    merged = (
        li_n.map_batches(li_partial, batch_format="pandas")
        .union(o_n.map_batches(o_rows, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(resolve, batch_format="pandas")
        .groupby("o_year")
        .aggregate(
            Sum("nation_cents", alias_name="nation_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )

    def add_share(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["share"] = df["nation_cents"].to_numpy(np.float64) / df[
            "total_cents"
        ].to_numpy(np.float64)
        return df

    return merged.map_batches(add_share, batch_format="pandas")


SQL_NATION_MARKET_SHARE = """
WITH rev AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS cents,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN cents ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN cents ELSE 0 END)
            AS DOUBLE) / SUM(cents) AS share
FROM rev GROUP BY 1
"""


QUERIES_TPCH = {
    "late_orders_by_priority": q_late_orders_by_priority,
    "small_qty_revenue": q_small_qty_revenue,
    "idle_rich_customers": q_idle_rich_customers,
    "nation_market_share": q_nation_market_share,
}

ORACLE_SQL_TPCH = {
    "late_orders_by_priority": SQL_LATE_ORDERS_BY_PRIORITY,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "idle_rich_customers": SQL_IDLE_RICH_CUSTOMERS,
    "nation_market_share": SQL_NATION_MARKET_SHARE,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_TPCH)
_MAIN_SQL.update(ORACLE_SQL_TPCH)
