"""Extended oracle-checked battery — multi-dim join trees, HAVING-style
aggregate filters, funnels, calendar rollups and webtext word statistics,
each expressed as the Ray-Data pattern that survives 100 TB:

- ship_priority_mix       conditional agg over a size-tiered fact join
                          (TPC-H Q12 shape; ref analog: typed-edge counts
                          per label, queries.py:1380-1417)
- region_revenue          5-way dim join tree collapsed into ONE fact scan
                          with broadcast lookups (Q5 shape)
- nation_pair_volume      pair-keyed rollup over the same join tree (Q7)
- large_volume_customers  aggregate → HAVING filter → output-scale
                          assembly via broadcast semi-joins (Q18)
- parts_supplier_types    two-level distinct (dedup partial → groupby)
                          with a broadcast dim attach (Q16 shape)
- orders_monthly          calendar-bucket rollup (strftime derive)
- event_funnel            pivoted per-key MIN + ordered-stage filter
                          (view→click→purchase funnel)
- word_topk               canonical wordcount: per-batch value_counts
                          partial → one word-keyed exchange → top-k
- word_repetition_docs    Gopher-style per-doc repetition metrics —
                          map-ONLY (each doc is one row; no shuffle)

Size-tier invariant (CLAUDE.md): every query that joins the fact table
against the orders dim is tiered on ``EXT_JOIN_BROADCAST_MAX`` —
broadcast sorted-key map-side join below it, hash-co-partitioned
``copartition_attach`` above it — and BOTH tiers produce identical rows
(forced-tier test in tests/test_analytics_ext.py). Money is integer
cents with half-away-from-zero rounding; every aggregate is
``CAST(... AS BIGINT)`` in the oracle so hashes are engine-stable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..util import get_broadcast
from .analytics import _cents, _round_half_away, _t

# below this many orders-dim rows the fact join is a broadcast sorted-key
# map-side join (a few MB per million rows); above it the fact stream is
# hash-co-partitioned against the dim (copartition_attach — one shuffle,
# no driver materialization of either side).
EXT_JOIN_BROADCAST_MAX = 5_000_000

# aggregate-filter threshold for large_volume_customers (≈ p90 of the
# per-order quantity sum in the synthetic tables at every sf)
LARGE_VOLUME_QTY = 200


def _i64(col) -> np.ndarray:
    """int64 view of an Arrow/pandas column, undoing null-widened float
    drift from pandas-merged tiers (values are integral by construction)."""
    if isinstance(col, (pa.ChunkedArray, pa.Array)):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.asarray(arr.cast(pa.int64()))
    return np.asarray(col, dtype=np.float64).astype(np.int64)


def _f64(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr, dtype=np.float64)


def _sorted_dim(sf_dir: str, table: str, key: str, cols: list[str]):
    """Driver-loaded dim as (sorted int64 keys, [value arrays]) — the
    broadcast side of a map-side join. Dim-scale by contract."""
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=[key, *cols])
    keys = np.asarray(t[key].to_pylist(), dtype=np.int64)
    srt = np.argsort(keys, kind="mergesort")
    vals = [np.asarray(t[c].to_pylist(), dtype=object)[srt] for c in cols]
    return keys[srt], vals


def _lookup(ks: np.ndarray, probe: np.ndarray):
    """searchsorted probe → (hit mask, clipped position)."""
    pos = np.searchsorted(ks, probe)
    pos_c = np.clip(pos, 0, max(len(ks) - 1, 0))
    hit = ks[pos_c] == probe if len(ks) else np.zeros(len(probe), bool)
    return hit, pos_c


def _nation_names(sf_dir: str):
    """nationkey-indexed name array (+ regionkey array)."""
    nt = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nk = np.asarray(nt["n_nationkey"].to_pylist(), dtype=np.int64)
    names = np.empty(nk.max() + 1, dtype=object)
    regs = np.zeros(nk.max() + 1, dtype=np.int64)
    names[nk] = np.asarray(nt["n_name"].to_pylist(), dtype=object)
    regs[nk] = np.asarray(nt["n_regionkey"].to_pylist(), dtype=np.int64)
    return names, regs


# --- ship_priority_mix (Q12 shape: conditional agg over tiered join) --------

_HIGH_PRIO = ("1-URGENT", "2-HIGH")


def q_ship_priority_mix(sf_dir: str):
    """Per returnflag: how many lineitems belong to high- vs low-priority
    orders. Broadcast tier ships ONE bit per order (sorted keys + bool
    array); the fact scan emits ≤ |returnflag| rows per batch. Distributed
    tier: copartition_attach then the identical per-batch partial."""
    from ray.data.aggregate import Sum

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def partial_from(flags_of_batch):
        def partial(t: pa.Table) -> pa.Table:
            rf, high = flags_of_batch(t)
            if rf is None or len(rf) == 0:
                return pa.Table.from_pydict(
                    {
                        "l_returnflag": pa.array([], pa.string()),
                        "high_line_count": pa.array([], pa.int64()),
                        "low_line_count": pa.array([], pa.int64()),
                    }
                )
            codes, cats = pd.factorize(rf)
            hi = np.bincount(codes, weights=high.astype(np.float64), minlength=len(cats)).astype(np.int64)
            tot = np.bincount(codes, minlength=len(cats)).astype(np.int64)
            return pa.Table.from_pydict(
                {
                    "l_returnflag": pa.array(list(cats), pa.string()),
                    "high_line_count": pa.array(hi),
                    "low_line_count": pa.array(tot - hi),
                }
            )

        return partial

    if orders.count() <= EXT_JOIN_BROADCAST_MAX:
        ot = pq.read_table(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
        )
        okeys = np.asarray(ot["o_orderkey"].to_pylist(), dtype=np.int64)
        prio = np.asarray(ot["o_orderpriority"].to_pylist(), dtype=object)
        srt = np.argsort(okeys, kind="mergesort")
        high = np.isin(prio[srt], _HIGH_PRIO)
        dim_ref = ray.put((okeys[srt], high))

        def flags(t: pa.Table):
            ks, hi = get_broadcast(dim_ref)
            lk = _i64(t["l_orderkey"])
            hit, pos = _lookup(ks, lk)
            rf = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)[hit]
            return rf, hi[pos[hit]]

        stream = li.map_batches(partial_from(flags), batch_format="pyarrow")
    else:
        from ..ops.joins import copartition_attach

        att = copartition_attach(
            li, orders, "l_orderkey", "o_orderkey", {"o_orderpriority": "prio"}
        )

        def flags(t: pa.Table):
            rf = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
            prio = np.asarray(t["prio"].to_pylist(), dtype=object)
            return rf, np.isin(prio, _HIGH_PRIO)

        stream = att.map_batches(partial_from(flags), batch_format="pyarrow")

    return stream.groupby("l_returnflag").aggregate(
        Sum("high_line_count", alias_name="high_line_count"),
        Sum("low_line_count", alias_name="low_line_count"),
    )


SQL_SHIP_PRIORITY_MIX = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""

# --- region_revenue (Q5 shape: join tree collapsed into one fact scan) ------

REGION_NAME = "AFRICA"


def _li_with_custkey(sf_dir: str):
    """lineitem stream with (rev_cents, l_suppkey, o_custkey) attached —
    the orders hop of the Q5/Q7 join tree, size-tiered. Returns a Dataset
    whose batches carry integral o_custkey."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        ext, disc = _f64(t["l_extendedprice"]), _f64(t["l_discount"])
        return pa.Table.from_pydict(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev_cents": pa.array(_round_half_away(ext * (1 - disc) * 100)),
            }
        )

    li2 = li.map_batches(derive, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    if orders.count() <= EXT_JOIN_BROADCAST_MAX:
        ks, (cust,) = _sorted_dim(sf_dir, "orders", "o_orderkey", ["o_custkey"])
        cust = cust.astype(np.int64)
        dim_ref = ray.put((ks, cust))

        def attach(t: pa.Table) -> pa.Table:
            k, cu = get_broadcast(dim_ref)
            lk = _i64(t["l_orderkey"])
            hit, pos = _lookup(k, lk)
            flt = t.filter(pa.array(hit))
            return flt.append_column("o_custkey", pa.array(cu[pos[hit]], pa.int64()))

        return li2.map_batches(attach, batch_format="pyarrow")
    from ..ops.joins import copartition_attach

    return copartition_attach(
        li2, orders, "l_orderkey", "o_orderkey", {"o_custkey": "o_custkey"}
    )


def _q5q7_partials(sf_dir: str):
    """Shared broadcast lookups for the Q5/Q7 tree: custkey→nationkey,
    suppkey→nationkey, nationkey→(name, regionkey)."""
    cks, (cnat,) = _sorted_dim(sf_dir, "customer", "c_custkey", ["c_nationkey"])
    sks, (snat,) = _sorted_dim(sf_dir, "supplier", "s_suppkey", ["s_nationkey"])
    names, regs = _nation_names(sf_dir)
    return ray.put(
        (cks, cnat.astype(np.int64), sks, snat.astype(np.int64), names, regs)
    )


def q_region_revenue(sf_dir: str):
    """Revenue per nation for REGION_NAME where the customer and supplier
    share a nation — the whole 5-way join tree is broadcast lookups
    inside one fact scan; only ≤|nation| rows leave each batch."""
    from ray.data.aggregate import Sum

    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    # missing region → sentinel no real regionkey equals → empty result,
    # matching the SQL's inner join (not a KeyError)
    rkey = {
        n: k for k, n in zip(
            region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()
        )
    }.get(REGION_NAME, -1)
    dims_ref = _q5q7_partials(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cks, cnat, sks, snat, names, regs = get_broadcast(dims_ref)
        cu = _i64(t["o_custkey"])
        su = _i64(t["l_suppkey"])
        rev = _i64(t["rev_cents"])
        chit, cpos = _lookup(cks, cu)
        shit, spos = _lookup(sks, su)
        cn = np.where(chit, cnat[cpos], -1)
        sn = np.where(shit, snat[spos], -2)
        mask = (cn == sn) & (regs[np.clip(sn, 0, len(regs) - 1)] == rkey) & shit & chit
        nb = len(names)
        cents = np.bincount(sn[mask], weights=rev[mask].astype(np.float64), minlength=nb).astype(np.int64)
        cnt = np.bincount(sn[mask], minlength=nb)
        nz = cnt > 0
        return pa.Table.from_pydict(
            {
                "n_name": pa.array(list(names[nz]), pa.string()),
                "revenue_cents": pa.array(cents[nz]),
            }
        )

    return (
        _li_with_custkey(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


SQL_REGION_REVENUE = f"""
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{REGION_NAME}' AND c_nationkey = s_nationkey
GROUP BY n_name
"""

# --- nation_pair_volume (Q7 shape: pair-keyed rollup) ------------------------

def q_nation_pair_volume(sf_dir: str):
    """Revenue per (supplier nation, customer nation) pair, sn ≠ cn.
    Same collapsed join tree as region_revenue; pair codes are
    ``sn * |nation| + cn`` so the per-batch partial is one bincount."""
    from ray.data.aggregate import Sum

    dims_ref = _q5q7_partials(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cks, cnat, sks, snat, names, _ = get_broadcast(dims_ref)
        cu, su, rev = _i64(t["o_custkey"]), _i64(t["l_suppkey"]), _i64(t["rev_cents"])
        chit, cpos = _lookup(cks, cu)
        shit, spos = _lookup(sks, su)
        mask = chit & shit
        cn, sn = cnat[cpos[mask]], snat[spos[mask]]
        ne = cn != sn
        cn, sn, r = cn[ne], sn[ne], rev[mask][ne]
        nb = len(names)
        code = sn * nb + cn
        cents = np.bincount(code, weights=r.astype(np.float64), minlength=nb * nb).astype(np.int64)
        cnt = np.bincount(code, minlength=nb * nb)
        nzc = np.flatnonzero(cnt)
        return pa.Table.from_pydict(
            {
                "supp_nation": pa.array([names[c // nb] for c in nzc], pa.string()),
                "cust_nation": pa.array([names[c % nb] for c in nzc], pa.string()),
                "revenue_cents": pa.array(cents[nzc]),
            }
        )

    return (
        _li_with_custkey(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


SQL_NATION_PAIR_VOLUME = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name
"""

# --- large_volume_customers (Q18 shape: agg → HAVING → assembly) -------------

def q_large_volume_customers(sf_dir: str):
    """Orders whose total quantity exceeds LARGE_VOLUME_QTY, with customer
    names. The fact table is reduced FIRST (per-batch bincount partial →
    one orderkey-keyed exchange → HAVING filter); everything after the
    filter is output-scale, assembled via broadcast ``is_in`` semi-joins —
    the orders/customer scans stream and never shuffle."""
    from ray.data.aggregate import Sum

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        lk = _i64(t["l_orderkey"])
        qty = _round_half_away(_f64(t["l_quantity"]))
        codes, uniq = pd.factorize(lk)
        sums = np.bincount(codes, weights=qty.astype(np.float64), minlength=len(uniq)).astype(np.int64)
        return pa.Table.from_pydict(
            {"l_orderkey": pa.array(uniq, pa.int64()), "total_qty": pa.array(sums)}
        )

    totals = (
        li.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("total_qty", alias_name="total_qty"))
    )
    big = totals.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"], LARGE_VOLUME_QTY)),
        batch_format="pyarrow",
    ).take_all()  # output-scale by construction (HAVING-selected rows)
    if not big:
        return pd.DataFrame(
            {
                "c_name": pd.Series([], dtype=str),
                "o_orderkey": pd.Series([], dtype=np.int64),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "total_qty": pd.Series([], dtype=np.int64),
            }
        )
    qty_by_key = {r["l_orderkey"]: r["total_qty"] for r in big}
    okeys = pa.array(sorted(qty_by_key), pa.int64())

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    sel = orders.map_batches(
        lambda t: t.filter(pc.is_in(t["o_orderkey"], value_set=okeys)),
        batch_format="pyarrow",
    ).take_all()
    custkeys = pa.array(sorted({r["o_custkey"] for r in sel}), pa.int64())
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    names = cust.map_batches(
        lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=custkeys)),
        batch_format="pyarrow",
    ).take_all()
    name_by_cust = {r["c_custkey"]: r["c_name"] for r in names}
    out = pd.DataFrame(sel)
    out["c_name"] = out["o_custkey"].map(name_by_cust)
    out["total_qty"] = out["o_orderkey"].map(qty_by_key).astype(np.int64)
    return out[["c_name", "o_orderkey", "o_orderdate", "total_qty"]]


SQL_LARGE_VOLUME = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) > {LARGE_VOLUME_QTY})
SELECT c_name, big.l_orderkey AS o_orderkey, o_orderdate, total_qty
FROM big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

# --- parts_supplier_types (Q16 shape: two-level distinct + dim attach) -------

def q_parts_supplier_types(sf_dir: str):
    """Distinct supplier count per (p_type, p_brand): per-batch dedup
    partials bound each exchange to distinct keys, the part dim is a
    broadcast lookup, and COUNT(DISTINCT) is the standard two-level
    groupby (distinct triples → count per pair)."""
    from ray.data.aggregate import Count

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = (
        li.map_batches(dedup_pairs, batch_format="pandas")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Count(alias_name="_c"))
    )
    pks, (ptype, pbrand) = _sorted_dim(sf_dir, "part", "p_partkey", ["p_type", "p_brand"])
    dim_ref = ray.put((pks, ptype, pbrand))

    def attach(t: pa.Table) -> pa.Table:
        ks, ty, br = get_broadcast(dim_ref)
        lk = _i64(t["l_partkey"])
        hit, pos = _lookup(ks, lk)
        return pa.Table.from_pydict(
            {
                "p_type": pa.array(list(ty[pos[hit]]), pa.string()),
                "p_brand": pa.array(list(br[pos[hit]]), pa.string()),
                "l_suppkey": pa.array(_i64(t["l_suppkey"])[hit], pa.int64()),
            }
        )

    triples = (
        pairs.map_batches(attach, batch_format="pyarrow")
        .map_batches(dedup_pairs, batch_format="pandas")
        .groupby(["p_type", "p_brand", "l_suppkey"])
        .aggregate(Count(alias_name="_c"))
    )
    return triples.groupby(["p_type", "p_brand"]).aggregate(
        Count(alias_name="supplier_cnt")
    )


SQL_PARTS_SUPPLIER = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_type, p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
GROUP BY p_type, p_brand
"""

# --- orders_monthly (calendar-bucket rollup) ---------------------------------

def q_orders_monthly(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    orders = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        month = pc.strftime(t["o_orderdate"].combine_chunks(), format="%Y-%m")
        return pa.Table.from_pydict(
            {"month": month, "cents": _cents(t["o_totalprice"])}
        )

    return (
        orders.map_batches(derive, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Count(alias_name="n_orders"), Sum("cents", alias_name="revenue_cents")
        )
    )


SQL_ORDERS_MONTHLY = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders GROUP BY month
"""

# --- event_funnel (pivoted MIN + ordered-stage filter) ------------------------

_FUNNEL = [("view", "t_view_us"), ("click", "t_click_us"), ("purchase", "t_buy_us")]


def q_event_funnel(sf_dir: str):
    """Users whose first view precedes their first click precedes their
    first purchase. Per-batch pivot partial (one row per distinct user per
    batch, epoch-µs with nulls) → one user-keyed MIN exchange → vectorized
    ordered-stage filter. Null stage → null comparison → row dropped,
    matching SQL three-valued logic."""
    from ray.data.aggregate import Min

    ev = _t(sf_dir, "events", ["user_id", "event_type", "ts"])
    stages = [s for s, _ in _FUNNEL]

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df[df["event_type"].isin(stages)]
        cols: dict = {}
        if df.empty:
            return pa.Table.from_pydict(
                {
                    "user_id": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for _, c in _FUNNEL},
                }
            )
        p = df.pivot_table(index="user_id", columns="event_type", values="ts", aggfunc="min")
        cols["user_id"] = pa.array(p.index.to_numpy(np.int64))
        for stage, out in _FUNNEL:
            if stage in p.columns:
                # normalize to µs explicitly — pandas ≥2 preserves the
                # parquet resolution, so .to_numpy() may be [us] OR [ns]
                v = p[stage].to_numpy().astype("datetime64[us]")
                mask = np.isnat(v)
                cols[out] = pa.array(v.astype(np.int64), pa.int64(), mask=mask)
            else:
                cols[out] = pa.nulls(len(p), pa.int64())
        return pa.Table.from_pydict(cols)

    agg = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(*[Min(c, alias_name=c) for _, c in _FUNNEL])
    )

    def _ts(col) -> pa.Array:
        # Ray's Min over a NULLABLE int64 widens the column to double;
        # epoch-µs values are < 2^53 so the round-trip through int64 is
        # exact
        return pc.cast(pc.cast(col, pa.int64()), pa.timestamp("us"))

    def finish(t: pa.Table) -> pa.Table:
        tv = _ts(t["t_view_us"])
        tc = _ts(t["t_click_us"])
        tb = _ts(t["t_buy_us"])
        keep = pc.and_(pc.less(tv, tc), pc.less(tc, tb))  # null → dropped
        out = pa.Table.from_pydict(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "t_view": tv,
                "t_click": tc,
                "t_buy": tb,
            }
        )
        return out.filter(keep)

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENT_FUNNEL = """
SELECT user_id, t_view, t_click, t_buy FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type='view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type='click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type='purchase' THEN ts END) AS t_buy
  FROM events GROUP BY user_id)
WHERE t_view < t_click AND t_click < t_buy
"""

# --- word_topk (canonical wordcount → top-k) ----------------------------------

WORD_TOPK = 50


def q_word_topk(sf_dir: str):
    """Corpus-wide top-k words: per-batch ``value_counts`` partial (the
    combiner — at most |vocab| rows leave a batch, not |words|), one
    word-keyed exchange, global sort+limit on the vocab-scale result."""
    from ray.data.aggregate import Sum

    docs = _t(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame(
            {"word": vc.index.astype(str), "cnt": vc.to_numpy(np.int64)}
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(WORD_TOPK)
    )


SQL_WORD_TOPK = f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word ORDER BY cnt DESC, word LIMIT {WORD_TOPK}
"""

# --- word_repetition_docs (Gopher-style repetition metrics, map-only) ---------

def q_word_repetition_docs(sf_dir: str):
    """Per-document repetition statistics (the Gopher/C4 quality-filter
    family: duplicate-fraction inputs). Each document is a single row, so
    this is a pure map — NO shuffle at any scale; the pandas
    split/explode/groupby chain is C-vectorized."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        s = df.set_index("doc_id")["text"].str.split(" ").explode()
        c = s.groupby([s.index, s.values]).size()
        g = c.groupby(level=0)
        tot, dis, mx = g.sum(), g.size(), g.max()
        return pd.DataFrame(
            {
                "doc_id": tot.index.to_numpy(np.int64),
                "n_words": tot.to_numpy(np.int64),
                "n_distinct": dis.to_numpy(np.int64),
                "top_word_count": mx.to_numpy(np.int64),
            }
        )

    return docs.map_batches(metrics, batch_format="pandas")


SQL_WORD_REPETITION = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
c AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_word_count
FROM c GROUP BY doc_id
"""

# --- benchmark_contamination (decontamination scan) ---------------------------

CONTAM_MOD = 41  # every 41st doc donates a snippet — benchmark-scale set
CONTAM_WORDS = 2


def q_benchmark_contamination(sf_dir: str):
    """Training-data decontamination: which corpus docs contain a
    benchmark snippet verbatim, and how many. The benchmark set is
    derived deterministically from the corpus itself (first
    CONTAM_WORDS words of every CONTAM_MOD-th doc) so the oracle can
    express the identical join; the scan is ops.text_analysis.contamination
    (broadcast snippet multiset, one streaming pass, no shuffle)."""
    from ..ops.text_analysis import contamination

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def snippet_partial(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df["doc_id"] % CONTAM_MOD == 0]
        sn = sel["text"].str.split(" ").str[:CONTAM_WORDS].str.join(" ")
        return pd.DataFrame({"snippet": sn.astype(str)})

    bench = docs.map_batches(snippet_partial, batch_format="pandas").take_all()
    # benchmark-scale by construction (|docs| / CONTAM_MOD rows)
    snippets = [r["snippet"] for r in bench]
    return contamination(docs, "text", "doc_id", snippets)


SQL_CONTAMINATION = f"""
WITH bench AS (
  SELECT array_to_string((string_split(text, ' '))[1:{CONTAM_WORDS}], ' ') AS snippet
  FROM documents WHERE doc_id % {CONTAM_MOD} = 0)
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM documents d JOIN bench b ON contains(d.text, b.snippet)
GROUP BY d.doc_id
"""

# ---------------------------------------------------------------------------

QUERIES_EXT = {
    "ship_priority_mix": q_ship_priority_mix,
    "region_revenue": q_region_revenue,
    "nation_pair_volume": q_nation_pair_volume,
    "large_volume_customers": q_large_volume_customers,
    "parts_supplier_types": q_parts_supplier_types,
    "orders_monthly": q_orders_monthly,
    "event_funnel": q_event_funnel,
    "word_topk": q_word_topk,
    "word_repetition_docs": q_word_repetition_docs,
    "benchmark_contamination": q_benchmark_contamination,
}

ORACLE_SQL_EXT = {
    "ship_priority_mix": SQL_SHIP_PRIORITY_MIX,
    "region_revenue": SQL_REGION_REVENUE,
    "nation_pair_volume": SQL_NATION_PAIR_VOLUME,
    "large_volume_customers": SQL_LARGE_VOLUME,
    "parts_supplier_types": SQL_PARTS_SUPPLIER,
    "orders_monthly": SQL_ORDERS_MONTHLY,
    "event_funnel": SQL_EVENT_FUNNEL,
    "word_topk": SQL_WORD_TOPK,
    "word_repetition_docs": SQL_WORD_REPETITION,
    "benchmark_contamination": SQL_CONTAMINATION,
}

# self-register into the main battery (safe in both import orders: by
# this line `analytics` is fully loaded — either it finished before this
# module started, or it is the importer and its registries were defined
# before its bottom `from . import analytics_ext`).
from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_EXT)
_MAIN_SQL.update(ORACLE_SQL_EXT)
