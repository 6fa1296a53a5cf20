"""Join operators beyond equi-joins.

- asof_join: per-key as-of (most recent right row at or before the left
  row's timestamp). Both sides are tagged, unioned, hash-co-partitioned
  by key in ONE shuffle, and each partition runs a vectorized
  ``pandas.merge_asof``. Reference analog: blame attribution — code
  range ⋈ most-specific blame range
  (``blarify/graph/relationship_creator.py:240-378``).
- interval_join: point-in-range containment per key (mention span →
  containing definition, ``definition_node.py:72-98``): sort intervals
  per key, ``np.searchsorted`` per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..ids import stable_u64


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    partitions: int = 32,
) -> ray.data.Dataset:
    """For every left row: attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same key (columns ``right_cols``;
    nulls when no match). One co-partitioning shuffle, merge_asof inside.
    """

    def tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            pk = [stable_u64(str(k)) % partitions for k in t[key].to_pylist()]
            t = t.append_column("_pkey", pa.array(pk, pa.int32()))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return f

    # union of differently-shaped tables: align columns with nulls
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)

    def widen(t: pa.Table, want: list[str]) -> pa.Table:
        for c in want:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows))
        return t.select(sorted(t.column_names))

    allcols = sorted(set(lcols) | set(rcols) | {"_pkey", "_side"})
    lt = left.map_batches(tag("L"), batch_format="pyarrow").map_batches(
        lambda t: widen(t, allcols), batch_format="pyarrow"
    )
    rt = right.map_batches(tag("R"), batch_format="pyarrow").map_batches(
        lambda t: widen(t, allcols), batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "L"][[c for c in lcols]].copy()
        rg = g[g["_side"] == "R"][[c for c in rcols]].copy()
        # the tagged union widens both sides with nulls → object dtypes;
        # restore comparable dtypes before merge_asof
        for df, ts_col in ((lg, left_ts), (rg, right_ts)):
            if df[ts_col].dtype == object or str(df[ts_col].dtype).startswith("datetime64"):
                df[ts_col] = pd.to_datetime(df[ts_col]).astype("datetime64[ns]")
        if lg[key].dtype != rg[key].dtype:
            try:
                lg[key] = lg[key].astype("int64")
                rg[key] = rg[key].astype("int64")
            except (TypeError, ValueError):
                lg[key] = lg[key].astype(str)
                rg[key] = rg[key].astype(str)
        lg = lg.sort_values([left_ts, key], kind="mergesort")
        rg = rg.sort_values([right_ts, key], kind="mergesort")
        if lg.empty:
            # full OUTPUT schema even for right-only partitions, so every
            # group's block unions cleanly downstream
            out = lg.copy()
            for c in [right_ts, *[c for c in right_cols if c != right_ts]]:
                if c not in out.columns:
                    out[c] = pd.Series([], dtype=rg[c].dtype if c in rg.columns else "object")
            return out
        out = pd.merge_asof(
            lg,
            rg[[key, right_ts, *[c for c in right_cols if c != right_ts]]],
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            direction="backward",
        )
        return out

    return (
        lt.union(rt)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def copartition_attach(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    attach: dict[str, str],
    partitions: int = 64,
    how: str = "inner",
) -> ray.data.Dataset:
    """Attach ``right`` columns to ``left`` rows by equality key with ONE
    hash-co-partitioning shuffle (no driver-side materialization of
    either side, no ``Dataset.join`` — which faults on empty hash
    partitions in Ray 2.49). ``attach`` maps right column → output name.
    ``right`` must be unique per key (a lookup/dimension side); use it
    when the right side is too large to broadcast.

    Scale shape: both sides move exactly once, keyed by
    ``hash(key) % partitions``; each Ray-level group runs one vectorized
    pandas merge. This is the co-partitioned form of the reference's
    SCIP in-memory symbol join (``scip_helper.py:748-835``)."""

    def _canon(k):
        # null-widened unions drift int64 → float64 in pandas; hash the
        # CANONICAL representation so both sides co-partition identically
        if isinstance(k, float) and float(k).is_integer():
            k = int(k)
        return stable_u64(str(k))

    def tag(side: str, key: str):
        def f(t: pa.Table) -> pa.Table:
            pk = [_canon(k) % partitions for k in t[key].to_pylist()]
            t = t.append_column("_pkey", pa.array(pk, pa.int32()))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return f

    lcols = list(left.schema().names)
    ltypes = dict(zip(left.schema().names, left.schema().types))
    def _is_int_type(t) -> bool:
        if isinstance(t, pa.DataType):
            return pa.types.is_integer(t)
        return getattr(t, "kind", "") in ("i", "u")  # numpy dtype (pandas blocks)

    int_lcols = [c for c in lcols if _is_int_type(ltypes.get(c))]
    rtypes = dict(zip(right.schema().names, right.schema().types))
    # attached int columns drift to float64 the same way left ones do
    # (null-widening + empty merge groups) — restore them too, so a
    # caller routing on an attached key hashes the same bits everywhere
    int_attach = [attach[c] for c in attach if _is_int_type(rtypes.get(c))]
    rkeep = [right_key, *[c for c in attach if c != right_key]]
    right = right.select_columns(rkeep)
    allcols = sorted(set(lcols) | set(rkeep) | {"_pkey", "_side"})

    def widen(t: pa.Table) -> pa.Table:
        for c in allcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows))
        return t.select(allcols)

    lt = left.map_batches(tag("L", left_key), batch_format="pyarrow").map_batches(
        widen, batch_format="pyarrow"
    )
    rt = right.map_batches(tag("R", right_key), batch_format="pyarrow").map_batches(
        widen, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "L"][lcols].copy()
        rg = g[g["_side"] == "R"][rkeep].copy()
        out_cols = [c for c in lcols] + [attach[c] for c in attach]
        # build the right side from ONLY the attach targets + a reserved
        # key column — a right column whose name collides with a left
        # column (e.g. a self-join of a label table) must never reach the
        # pandas merge, where suffixing would break out_cols selection
        rsub = pd.DataFrame({attach[c]: rg[c] for c in attach})
        rsub["_rk"] = rg[right_key]
        rk = "_rk"
        if lg[left_key].dtype != rsub[rk].dtype:
            try:
                lg[left_key] = lg[left_key].astype("int64")
                rsub[rk] = rsub[rk].astype("int64")
            except (TypeError, ValueError):
                lg[left_key] = lg[left_key].astype(str)
                rsub[rk] = rsub[rk].astype(str)
        out = lg.merge(rsub, left_on=left_key, right_on=rk, how=how)
        out = out[out_cols]
        for c in int_lcols + int_attach:  # undo float64 drift from null-widening
            if out[c].dtype != "int64":
                try:
                    out[c] = out[c].astype("int64")
                except (TypeError, ValueError):
                    pass
        return out

    return lt.union(rt).groupby("_pkey").map_groups(merge, batch_format="pandas")


def copartition_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    attach: dict[str, str],
    partitions: int = 64,
) -> ray.data.Dataset:
    """One-to-MANY co-partitioned equi-join: the same single-shuffle
    machinery as ``copartition_attach``, but the right side may carry any
    number of rows per key — each left row emits one output row per
    right match (inner semantics, fan-out allowed). Use for edge-table
    expansion (pattern matching, traversals), where ``attach``'s
    unique-dimension contract doesn't hold."""
    return copartition_attach(
        left, right, left_key, right_key, attach, partitions=partitions, how="inner"
    )


def most_specific_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    payload_cols: list[str],
    tie_cols: list[str] | None = None,
    partitions: int = 32,
) -> ray.data.Dataset:
    """Attach, per key, the MOST SPECIFIC containing interval to each
    point: among intervals with ``start ≤ point < end`` for the same key,
    pick the one with the smallest width (end-start), ties broken by
    (start, *tie_cols) ascending. The blame-attribution shape — the
    reference keeps the match with the minimum specificity level
    (``blarify/graph/relationship_creator.py:320-378``); intervals here
    MAY overlap/nest arbitrarily, unlike ``interval_join``.

    One co-partitioning shuffle; inside each partition a vectorized
    pandas merge enumerates (point × same-key interval) candidates —
    bounded by intervals-per-key, the usual blame fan-out."""
    tie_cols = tie_cols or []

    def tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            pk = [stable_u64(str(k)) % partitions for k in t[key].to_pylist()]
            t = t.append_column("_pkey", pa.array(pk, pa.int32()))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return f

    pcols = list(points.schema().names)
    icols = list(intervals.schema().names)
    allcols = sorted(set(pcols) | set(icols) | {"_pkey", "_side"})

    def widen(t: pa.Table) -> pa.Table:
        for c in allcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows))
        return t.select(allcols)

    pt = points.map_batches(tag("P"), batch_format="pyarrow").map_batches(widen, batch_format="pyarrow")
    it = intervals.map_batches(tag("I"), batch_format="pyarrow").map_batches(widen, batch_format="pyarrow")

    def match(g: pd.DataFrame) -> pd.DataFrame:
        pg = g[g["_side"] == "P"][pcols].copy()
        ig = g[g["_side"] == "I"][icols].copy()
        if pg.empty or ig.empty:
            return pd.DataFrame(columns=[*pcols, start_col, end_col, *payload_cols]).iloc[0:0]
        pg["_rowid"] = np.arange(len(pg))
        cand = pg.merge(ig, on=key, how="inner")
        cand = cand[(cand[start_col] <= cand[point_col]) & (cand[point_col] < cand[end_col])]
        if cand.empty:
            return pd.DataFrame(columns=[*pcols, start_col, end_col, *payload_cols]).iloc[0:0]
        cand["_width"] = cand[end_col] - cand[start_col]
        cand = cand.sort_values(
            ["_rowid", "_width", start_col, *tie_cols], kind="mergesort"
        ).drop_duplicates("_rowid")
        return cand[[*pcols, start_col, end_col, *payload_cols]].reset_index(drop=True)

    return pt.union(it).groupby("_pkey").map_groups(match, batch_format="pandas")


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    payload_cols: list[str],
    partitions: int = 32,
) -> ray.data.Dataset:
    """Attach, per key, the interval [start, end) containing each point
    (innermost = the one with the greatest start ≤ point, mirroring the
    reference's innermost-definition search). Assumes intervals within a
    key are non-overlapping at the same nesting level."""

    def tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            pk = [stable_u64(str(k)) % partitions for k in t[key].to_pylist()]
            t = t.append_column("_pkey", pa.array(pk, pa.int32()))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return f

    pcols = list(points.schema().names)
    icols = list(intervals.schema().names)
    allcols = sorted(set(pcols) | set(icols) | {"_pkey", "_side"})

    def widen(t: pa.Table) -> pa.Table:
        for c in allcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows))
        return t.select(allcols)

    pt = points.map_batches(tag("P"), batch_format="pyarrow").map_batches(widen, batch_format="pyarrow")
    it = intervals.map_batches(tag("I"), batch_format="pyarrow").map_batches(widen, batch_format="pyarrow")

    def match(g: pd.DataFrame) -> pd.DataFrame:
        pg = g[g["_side"] == "P"][pcols]
        ig = g[g["_side"] == "I"][icols]
        outs = []
        for k, pk in pg.groupby(key, sort=True):
            ik = ig[ig[key] == k].sort_values(start_col, kind="mergesort")
            if ik.empty:
                continue
            starts = ik[start_col].to_numpy()
            ends = ik[end_col].to_numpy()
            pos = np.searchsorted(starts, pk[point_col].to_numpy(), side="right") - 1
            ok = (pos >= 0) & (pk[point_col].to_numpy() < ends[np.clip(pos, 0, None)])
            sub = pk[ok].copy()
            for c in payload_cols:
                sub[c] = ik[c].to_numpy()[pos[ok]]
            outs.append(sub)
        if not outs:
            return pg.iloc[0:0]
        return pd.concat(outs, ignore_index=True)

    return pt.union(it).groupby("_pkey").map_groups(match, batch_format="pandas")


def interval_self_join(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    id_col: str,
    window_us: int,
    partitions: int = 64,
) -> "ray.data.Dataset":
    """Stream-stream WINDOW self-join: all ordered pairs (a, b) with the
    same key and ``0 < ts_b - ts_a <= window_us`` — the bounded-interval
    join of streaming engines (CEP bursts, retry detection, session
    stitching), distinct from ``asof_join`` (which keeps ONE match).

    Scale shape: rows are hash-co-partitioned by key (every key's events
    land whole in one partition), and each partition runs a BANDING
    join — an event in time-bucket k (bucket width = window) can only
    pair with events in buckets k and k+1, so two vectorized pandas
    merges + one filter produce exactly the window pairs with NO per-key
    Python and no quadratic blowup beyond events-per-key-per-window
    (the inherent output size of the operator).

    Returns ds[(key, id_a, id_b, gap_us)].
    """
    import pandas as pd

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = (
            pd.util.hash_array(df[key].to_numpy()) % partitions
        ).astype("int32")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        t = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = pd.DataFrame(
            {"k": g[key].to_numpy(), "i": g[id_col].to_numpy(np.int64), "t": t}
        )
        b = t // window_us
        left = base.assign(jb=b)
        # right side appears under its own bucket AND the previous one,
        # so every (a in k) × (b in k or k+1) candidate meets in a merge
        cand = pd.concat([base.assign(jb=b), base.assign(jb=b - 1)], ignore_index=True)
        m = left.merge(cand, on=["k", "jb"], suffixes=("_a", "_b"))
        gap = m["t_b"] - m["t_a"]
        m = m[(gap > 0) & (gap <= window_us)]
        out = pd.DataFrame(
            {
                key: m["k"].to_numpy(),
                "id_a": m["i_a"].to_numpy(np.int64),
                "id_b": m["i_b"].to_numpy(np.int64),
                "gap_us": (m["t_b"] - m["t_a"]).to_numpy(np.int64),
            }
        )
        return out.sort_values([key, "id_a", "id_b"], kind="mergesort").reset_index(drop=True)

    return (
        ds.map_batches(route, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(pairs, batch_format="pandas")
    )
