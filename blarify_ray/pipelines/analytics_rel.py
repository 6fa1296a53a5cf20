"""Relational-composition / semi-structured battery — four operator
shapes no earlier battery covers, each DuckDB-oracle-checked:

- ``sole_late_supplier``: TPC-H Q21's double-correlated EXISTS /
  NOT-EXISTS — suppliers who were the ONLY late shipper in a
  multi-supplier order — resolved in ONE orderkey-keyed exchange (no
  per-subquery passes, no driver state).
- ``cheapest_part_per_brand``: groupwise-min JOIN-BACK (TPC-H Q2's
  correlated scalar subquery) — the per-group scalar is computed
  distributed, broadcast once at group-scale, and joined back as a
  map-only filter; ties keep every matching row, exactly like SQL.
- ``props_value_stats``: semi-structured extraction — a JSON payload
  column parsed with a VECTORIZED Arrow regex kernel
  (``pc.extract_regex``), never a per-row ``json.loads`` loop.
- ``lineitem_profile``: one-pass multi-column data profiler (Deequ
  shape) — count / min / max / exact NDV for a set of bounded-
  cardinality columns from a SINGLE scan whose exchange carries only
  (column, distinct-value, count) partials.

Reference analog: the aggregate/diagnostic query family
(``blarify/db_managers/queries.py``); re-expressed as distributed Ray
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

_US_90D = 90 * 86_400_000_000

# --- sole_late_supplier (Q21 double-correlated EXISTS / NOT EXISTS) ----------


def q_sole_late_supplier(sf_dir: str):
    """Suppliers who, in an order served by ≥ 2 distinct suppliers, were
    the ONLY one to ship late (any line > 90 days after the order date),
    with the number of such orders — TPC-H Q21's shape: an EXISTS
    (another supplier in the order) AND a NOT EXISTS (another LATE
    supplier) correlated on the same key.

    Scale shape: both correlated subqueries collapse into ONE
    orderkey-keyed exchange. Lineitem reduces per batch to
    (order, supplier) → MAX(shipdate) partials ("any line late" ≡
    "latest line late", so the flag merges as a max); orders ship
    (order, date) rows tagged ``supplier = -1`` through the same
    exchange. Inside a partition everything is vectorized: re-merge
    partials, attach the date, derive per-order supplier / late-supplier
    counts with two groupby-transforms, and emit the qualifying
    (supplier, order) pairs. A supplier-scale Sum finishes. Raw lines
    never shuffle; the exchange carries (order × supplier)-scale rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "okey": df["l_orderkey"].to_numpy(np.int64),
                    "skey": df["l_suppkey"].to_numpy(np.int64),
                    "us": df["l_shipdate"].astype("int64").to_numpy(),
                }
            )
            .groupby(["okey", "skey"], sort=False)["us"]
            .max()
            .reset_index()
        )
        return _route(g, "okey")

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "okey": df["o_orderkey"].to_numpy(np.int64),
                "skey": np.full(len(df), -1, np.int64),
                "us": df["o_orderdate"].astype("int64").to_numpy(),
            }
        )
        return _route(out, "okey")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        dates = g[g["skey"] == -1]
        supp = g[g["skey"] != -1]
        # re-merge cross-batch partials: one row per (order, supplier)
        supp = supp.groupby(["okey", "skey"], sort=False)["us"].max().reset_index()
        m = supp.merge(
            dates[["okey", "us"]].rename(columns={"us": "odate"}), on="okey"
        )
        late = (m["us"].to_numpy() > m["odate"].to_numpy() + _US_90D)
        m = m.assign(late=late.astype(np.int64))
        per_order = m.groupby("okey", sort=False)["late"].agg(["count", "sum"])
        m = m.join(per_order, on="okey")
        hit = m[(m["late"] == 1) & (m["count"] >= 2) & (m["sum"] == 1)]
        return pd.DataFrame(
            {
                "s_suppkey": hit["skey"].to_numpy(np.int64),
                "numwait": np.ones(len(hit), np.int64),
            }
        )

    merged = (
        li.map_batches(li_partial, batch_format="pandas")
        .union(orders.map_batches(o_rows, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(resolve, batch_format="pandas")
    )
    return merged.groupby("s_suppkey").aggregate(Sum("numwait", alias_name="numwait"))


SQL_SOLE_LATE_SUPPLIER = """
WITH ls AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
od AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
       FROM ls GROUP BY 1)
SELECT l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM ls JOIN od USING (l_orderkey)
WHERE ls.late = 1 AND od.n_supp >= 2 AND od.n_late = 1
GROUP BY 1
"""


# --- cheapest_part_per_brand (groupwise-min join-back, Q2 shape) -------------


def q_cheapest_part_per_brand(sf_dir: str):
    """Every part priced at its brand's MINIMUM retail price (ties keep
    all rows) — TPC-H Q2's correlated scalar subquery
    (``p_retailprice = (SELECT MIN(...) WHERE same brand)``).

    Scale shape: the per-group scalar is computed as a distributed Min
    aggregate (per-batch partials → group-scale exchange), the
    group→min table (brand-scale, tiny) is broadcast ONCE via
    ``ray.put``, and the join-back is a map-only vectorized filter over
    a second scan — the detail table never shuffles."""
    import ray
    from ray.data.aggregate import Min

    from ..util import get_broadcast

    cols = ["p_partkey", "p_name", "p_brand", "p_retailprice"]
    part = _t(sf_dir, "part", cols)

    def pre_min(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("p_brand", sort=False)["p_retailprice"].min().reset_index()
        )

    mins = (
        _t(sf_dir, "part", ["p_brand", "p_retailprice"])
        .map_batches(pre_min, batch_format="pandas")
        .groupby("p_brand")
        .aggregate(Min("p_retailprice", alias_name="mn"))
        .to_pandas()  # brand-scale (tens of rows)
    )
    mins_ref = ray.put(dict(zip(mins["p_brand"], mins["mn"])))

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        lut = get_broadcast(mins_ref)
        mn = df["p_brand"].map(lut).to_numpy(np.float64)
        hit = df[df["p_retailprice"].to_numpy(np.float64) == mn]
        return pd.DataFrame(
            {
                "p_brand": hit["p_brand"].astype(str),
                "p_partkey": hit["p_partkey"].to_numpy(np.int64),
                "p_name": hit["p_name"].astype(str),
                "price_cents": _round_half_away(
                    hit["p_retailprice"].to_numpy(np.float64) * 100
                ),
            }
        )

    return part.map_batches(keep_min, batch_format="pandas")


SQL_CHEAPEST_PART_PER_BRAND = """
SELECT p.p_brand, p.p_partkey, p.p_name,
       CAST(ROUND(p.p_retailprice*100) AS BIGINT) AS price_cents
FROM part p
JOIN (SELECT p_brand, MIN(p_retailprice) AS mn FROM part GROUP BY 1) m
  ON p.p_brand = m.p_brand AND p.p_retailprice = m.mn
"""


# --- props_value_stats (vectorized semi-structured extraction) ---------------

#: the events feed's payload contract: a flat JSON object whose ``k``
#: member is an integer. The Arrow regex kernel extracts it without a
#: per-row json.loads; a schema change would surface as extraction
#: nulls, which the count column exposes.
_PROPS_K = r'"k":\s*(?P<k>-?\d+)'


def q_props_value_stats(sf_dir: str):
    """Per event type: row count, SUM and MAX of the integer ``k`` field
    extracted from the JSON ``props`` payload column — the
    semi-structured-projection shape (JSON string → typed column).

    Scale shape: extraction is one vectorized ``pc.extract_regex`` call
    per Arrow batch (zero-copy in, no Python-object rows); per-batch
    partials reduce to event-type scale before the (tiny) final
    aggregate."""
    from ray.data.aggregate import Max, Sum

    ev = _t(sf_dir, "events", ["event_type", "props"])

    _SENT = np.iinfo(np.int64).min  # below any real k: Max-neutral

    def partial(t: pa.Table) -> pa.Table:
        k = pc.struct_field(
            pc.extract_regex(t["props"].combine_chunks(), _PROPS_K), "k"
        )
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas().astype(str),
                "k": pc.cast(k, pa.int64()).to_pandas(),
            }
        )
        # SQL aggregate semantics: COUNT(*) counts every row; SUM/MAX
        # skip nulls and are NULL for an all-null group. Track the
        # non-null count so the FINAL fold can restore the NULLs the
        # mergeable int partials can't carry.
        g = df.groupby("event_type", sort=False).agg(
            n_events=("k", "size"),
            n_k=("k", "count"),
            sum_k=("k", lambda v: int(v.sum()) if v.notna().any() else 0),
            max_k=("k", lambda v: int(v.max()) if v.notna().any() else _SENT),
        )
        return pa.Table.from_pydict(
            {
                "event_type": pa.array(g.index, pa.string()),
                "n_events": pa.array(g["n_events"].to_numpy(np.int64)),
                "n_k": pa.array(g["n_k"].to_numpy(np.int64)),
                "sum_k": pa.array(g["sum_k"].to_numpy(np.int64)),
                "max_k": pa.array(g["max_k"].to_numpy(np.int64)),
            }
        )

    merged = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_k", alias_name="n_k"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )

    def restore_nulls(df: pd.DataFrame) -> pd.DataFrame:
        has = df["n_k"].to_numpy(np.int64) > 0
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].astype(str),
                "n_events": df["n_events"].to_numpy(np.int64),
                "sum_k": pd.array(df["sum_k"].to_numpy(np.int64), dtype="Int64"),
                "max_k": pd.array(df["max_k"].to_numpy(np.int64), dtype="Int64"),
            }
        )
        out.loc[~has, ["sum_k", "max_k"]] = pd.NA
        return out

    return merged.map_batches(restore_nulls, batch_format="pandas")


SQL_PROPS_VALUE_STATS = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1
"""


# --- lineitem_profile (one-pass multi-column profiler) -----------------------

#: bounded-cardinality numeric columns — the exact-NDV histogram path.
#: High-cardinality columns belong on the HLL sketch path instead
#: (``ops/sketches.py``, approx_distinct_users); mixing the two per
#: column is exactly what a production profiler does.
_PROFILE_COLS = ["l_quantity", "l_discount", "l_tax", "l_linenumber"]


def q_lineitem_profile(sf_dir: str):
    """Column profile (row count, min, max, exact distinct count) for
    four bounded-cardinality lineitem columns in ONE scan — the Deequ /
    data-quality-profiler shape.

    Scale shape: each batch folds every column to its (column, value) →
    count histogram, so the single exchange carries only distinct-value-
    scale rows (~77 per batch here) regardless of row count; min / max /
    n / ndv all derive from the merged histogram. Rows never shuffle;
    adding a column costs one more per-batch fold, not another scan."""
    li = _t(sf_dir, "lineitem", _PROFILE_COLS)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in _PROFILE_COLS:
            vc = df[c].astype(np.float64).value_counts()
            frames.append(
                pd.DataFrame(
                    {
                        "col": c,
                        "value": vc.index.to_numpy(np.float64),
                        "cnt": vc.to_numpy(np.int64),
                    }
                )
            )
        return _route(pd.concat(frames, ignore_index=True), "col")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        hist = g.groupby(["col", "value"], sort=False)["cnt"].sum().reset_index()
        prof = hist.groupby("col", sort=False).agg(
            n=("cnt", "sum"),
            min_v=("value", "min"),
            max_v=("value", "max"),
            ndv=("value", "size"),
        )
        return pd.DataFrame(
            {
                "col": prof.index.astype(str),
                "n": prof["n"].to_numpy(np.int64),
                "min_v": prof["min_v"].to_numpy(np.float64),
                "max_v": prof["max_v"].to_numpy(np.float64),
                "ndv": prof["ndv"].to_numpy(np.int64),
            }
        )

    return (
        li.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(finish, batch_format="pandas")
    )


SQL_LINEITEM_PROFILE = """
SELECT 'l_quantity' AS col, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv FROM lineitem
UNION ALL SELECT 'l_discount', COUNT(*), MIN(l_discount), MAX(l_discount),
       COUNT(DISTINCT l_discount) FROM lineitem
UNION ALL SELECT 'l_tax', COUNT(*), MIN(l_tax), MAX(l_tax),
       COUNT(DISTINCT l_tax) FROM lineitem
UNION ALL SELECT 'l_linenumber', COUNT(*), CAST(MIN(l_linenumber) AS DOUBLE),
       CAST(MAX(l_linenumber) AS DOUBLE), COUNT(DISTINCT l_linenumber)
FROM lineitem
"""


QUERIES_REL = {
    "sole_late_supplier": q_sole_late_supplier,
    "cheapest_part_per_brand": q_cheapest_part_per_brand,
    "props_value_stats": q_props_value_stats,
    "lineitem_profile": q_lineitem_profile,
}

ORACLE_SQL_REL = {
    "sole_late_supplier": SQL_SOLE_LATE_SUPPLIER,
    "cheapest_part_per_brand": SQL_CHEAPEST_PART_PER_BRAND,
    "props_value_stats": SQL_PROPS_VALUE_STATS,
    "lineitem_profile": SQL_LINEITEM_PROFILE,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_REL)
_MAIN_SQL.update(ORACLE_SQL_REL)
