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
    lcols = [f.name for f in left.schema().base_schema]
    rcols = [f.name for f in right.schema().base_schema]

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

    pcols = [f.name for f in points.schema().base_schema]
    icols = [f.name for f in intervals.schema().base_schema]
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
