"""Quantile / range-window / argmax battery — four operator shapes no
earlier battery covers, each DuckDB-oracle-checked:

- ``rolling_value_7d``: RANGE-frame window (7-day trailing sum per user
  at every event) — the time-based sibling of running_revenue_per_user's
  ROWS cumsum; peers (equal timestamps) aggregate together exactly like
  SQL's RANGE frame.
- ``chars_percentiles_by_lang``: EXACT p25/p50/p75/p90 per group via the
  integer value-histogram trick — per-batch (group, value) COUNT
  partials, a distinct-value-scale exchange, cumulative selection. No
  whole-group row routing: exact quantiles of a bounded-int column scale
  to any group size (the fully-scalable exact path next to
  median_price_by_flag's value-routed exact median and KLL's sketch).
- ``mode_event_per_user``: per-key argmax with deterministic tie-break
  (most frequent event type, ties → lexicographically smallest) — the
  mergeable-partial-counts shape behind any "dominant category" feature.
- ``ntile_chars_by_source``: NTILE(4) quartile statistics per source
  (docs per quartile, min/max chars) computed from the same (group,
  value) histogram — quartile COUNTS and value BOUNDS depend only on the
  value multiset, so no per-doc rank materializes.

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

from .analytics import _round_half_away, _route, _t

_US_7D = 7 * 86_400_000_000

# --- rolling_value_7d (RANGE-frame trailing window) ---------------------------


def q_rolling_value_7d(sf_dir: str):
    """For every event: the sum of the user's event values (cents) in
    the trailing 7 days INCLUSIVE — SQL's ``RANGE BETWEEN INTERVAL 7 DAY
    PRECEDING AND CURRENT ROW`` (timestamp peers share one frame).

    Scale shape: ONE user-keyed exchange; inside a partition the frame
    lookup is fully vectorized — users' time ranges are offset onto one
    monotone axis (each user's block shifted past the previous user's
    span + window) so a single global ``searchsorted`` finds every
    row's frame start; cumsum differences give the sums. No per-user
    Python loop."""
    ev = _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "ts": df["ts"].astype("int64").to_numpy(),
                "cents": _round_half_away(
                    df["value"].to_numpy(np.float64) * 100
                ).astype(np.int64),
            }
        )
        return _route(out, "user_id")

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        # offset each user's times onto one strictly-separated monotone
        # axis: block k starts one window past block k-1's end, so no
        # frame can reach a neighbour user
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        t0 = ts[np.maximum.accumulate(np.where(new_user, np.arange(len(g)), 0))]
        rel = ts - t0  # µs since the user's first event (≥ 0)
        seg = np.cumsum(new_user) - 1  # dense user index, in order
        # per-user span, scattered back per row
        seg_end = np.zeros(seg[-1] + 1 if len(g) else 0, dtype=np.int64)
        if len(g):
            np.maximum.at(seg_end, seg, rel)
        # the combined axis (Σ spans + 7d each) can exceed int64 when a
        # partition holds very many long-span users — process CONTIGUOUS
        # user chunks whose axis stays < 2^61 (chunk assignment may use
        # float prefix sums: its ~µs rounding is negligible against the
        # 2^61 margin; the exact int64 offsets are rebuilt per chunk)
        span = seg_end + _US_7D + 1
        approx_prefix = np.cumsum(span.astype(np.float64)) - span.astype(np.float64)
        chunk_of_seg = (approx_prefix // float(1 << 61)).astype(np.int64)
        chunk_rows = chunk_of_seg[seg]  # nondecreasing: chunks are slices
        starts = np.flatnonzero(np.r_[True, chunk_rows[1:] != chunk_rows[:-1]])
        bounds = np.r_[starts, len(g)]
        roll = np.empty(len(g), np.int64)
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            if s1 == s0:
                continue
            segs = seg[s0:s1]
            base = segs[0]
            spans = span[base : segs[-1] + 1]
            off = np.zeros(len(spans), np.int64)
            if len(spans) > 1:
                off[1:] = np.cumsum(spans[:-1])
            adj = rel[s0:s1] + off[segs - base]
            # frame = rows with adj in [adj_i - 7d, adj_i]; right edge
            # must include PEERS (equal timestamps) → side='right'
            lo = np.searchsorted(adj, adj - _US_7D, side="left")
            hi = np.searchsorted(adj, adj, side="right")
            cs = np.concatenate([[0], np.cumsum(c[s0:s1])])
            roll[s0:s1] = cs[hi] - cs[lo]
        return pd.DataFrame(
            {
                "user_id": u,
                "event_id": g["event_id"].to_numpy(np.int64),
                "roll_cents": roll,
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(win, batch_format="pandas")
    )


SQL_ROLLING_VALUE_7D = """
SELECT user_id, event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS roll_cents
FROM events
"""

# --- chars_percentiles_by_lang (exact quantiles via value histogram) ----------

_PCT_BPS = (25, 50, 75, 90)  # percentiles as integer percent (exact math)
_PCT_COLS = ("p25_chars", "p50_chars", "p75_chars", "p90_chars")


def q_chars_percentiles_by_lang(sf_dir: str):
    """Exact p25/p50/p75/p90 of document length per language,
    PERCENTILE_DISC semantics (the value whose rank is ⌈q·n⌉).

    Scale shape: per-batch (lang, n_chars) COUNT partials → ONE
    lang-keyed exchange carrying DISTINCT-VALUE-scale rows (whole
    languages per partition) → cumulative-count selection. Document
    rows never shuffle; group size is unbounded because only the value
    histogram moves."""
    docs = _t(sf_dir, "documents", ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby(["lang", "n_chars"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out = pd.DataFrame(
            {
                "lang": c["lang"].astype(str),
                "v": c["n_chars"].to_numpy(np.int64),
                "cnt": c["cnt"].to_numpy(np.int64),
            }
        )
        return _route(out, "lang")

    def select(g: pd.DataFrame) -> pd.DataFrame:
        h = (
            g.groupby(["lang", "v"], sort=False)["cnt"]
            .sum()
            .reset_index()
            .sort_values(["lang", "v"], kind="mergesort")
        )
        rows = []
        # group-scale loop (#langs per partition), vectorized per lang
        for lang, hh in h.groupby("lang", sort=False):
            v = hh["v"].to_numpy(np.int64)
            cum = np.cumsum(hh["cnt"].to_numpy(np.int64))
            n = cum[-1]
            # ⌈q·n⌉ in EXACT integer arithmetic — SQL's 0.90 literal is
            # DECIMAL (exact) while numpy's is a double; (p·n + 99)//100
            # is unambiguous on both sides
            ranks = (np.array(_PCT_BPS, dtype=np.int64) * n + 99) // 100
            idx = np.searchsorted(cum, ranks, side="left")
            rows.append((lang, *v[idx]))
        return pd.DataFrame(rows, columns=["lang", *_PCT_COLS]).astype(
            {c: np.int64 for c in _PCT_COLS}
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(select, batch_format="pandas")
    )


SQL_CHARS_PERCENTILES = """
WITH r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM documents)
SELECT lang,
  CAST(MAX(CASE WHEN rn = (25 * cnt + 99) // 100 THEN n_chars END) AS BIGINT) AS p25_chars,
  CAST(MAX(CASE WHEN rn = (50 * cnt + 99) // 100 THEN n_chars END) AS BIGINT) AS p50_chars,
  CAST(MAX(CASE WHEN rn = (75 * cnt + 99) // 100 THEN n_chars END) AS BIGINT) AS p75_chars,
  CAST(MAX(CASE WHEN rn = (90 * cnt + 99) // 100 THEN n_chars END) AS BIGINT) AS p90_chars
FROM r GROUP BY lang
"""

# --- mode_event_per_user (argmax with deterministic tie-break) ----------------


def q_mode_event_per_user(sf_dir: str):
    """Each user's most frequent event type; ties break to the
    lexicographically smallest type (pinned in both engine and SQL —
    an unpinned mode() would not hash-match).

    Scale shape: per-batch (user, type) COUNT partials → ONE user-keyed
    exchange of user×type-scale rows → vectorized partition-local
    argmax (sort + first-row-per-user)."""
    ev = _t(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out = pd.DataFrame(
            {
                "user_id": c["user_id"].to_numpy(np.int64),
                "et": c["event_type"].astype(str),
                "n": c["n"].to_numpy(np.int64),
            }
        )
        return _route(out, "user_id")

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "et"], sort=False)["n"].sum().reset_index()
        s = s.sort_values(
            ["user_id", "n", "et"], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id")
        return pd.DataFrame(
            {
                "user_id": s["user_id"].to_numpy(np.int64),
                "mode_type": s["et"].astype(str),
                "n_events": s["n"].to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(argmax, batch_format="pandas")
    )


SQL_MODE_EVENT_PER_USER = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
  FROM c)
SELECT user_id, event_type AS mode_type, n AS n_events
FROM r WHERE rk = 1
"""

# --- ntile_chars_by_source (quartile stats from the value histogram) ----------


def q_ntile_chars_by_source(sf_dir: str):
    """NTILE(4) of each source's docs by length: docs per quartile and
    the quartile's min/max n_chars. Quartile COUNTS (first n%4 buckets
    get one extra row) and value BOUNDS depend only on the sorted value
    multiset, so the whole answer derives from the (source, n_chars)
    histogram — no per-doc rank ever materializes.

    Scale shape: same histogram exchange as chars_percentiles_by_lang
    (distinct-value-scale rows, whole sources per partition)."""
    docs = _t(sf_dir, "documents", ["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby(["source", "n_chars"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out = pd.DataFrame(
            {
                "source": c["source"].astype(str),
                "v": c["n_chars"].to_numpy(np.int64),
                "cnt": c["cnt"].to_numpy(np.int64),
            }
        )
        return _route(out, "source")

    def quartiles(g: pd.DataFrame) -> pd.DataFrame:
        h = (
            g.groupby(["source", "v"], sort=False)["cnt"]
            .sum()
            .reset_index()
            .sort_values(["source", "v"], kind="mergesort")
        )
        rows = []
        # group-scale loop (#sources per partition), vectorized per source
        for src, hh in h.groupby("source", sort=False):
            v = hh["v"].to_numpy(np.int64)
            cum = np.cumsum(hh["cnt"].to_numpy(np.int64))
            n = int(cum[-1])
            q, r = divmod(n, 4)
            sizes = np.array([q + (1 if i < r else 0) for i in range(4)])
            ends = np.cumsum(sizes)  # 1-based rank of each bucket's last row
            starts = ends - sizes + 1  # 1-based rank of each bucket's first row
            for b in range(4):
                if sizes[b] == 0:
                    continue
                lo_v = v[np.searchsorted(cum, starts[b], side="left")]
                hi_v = v[np.searchsorted(cum, ends[b], side="left")]
                rows.append((src, b + 1, int(sizes[b]), int(lo_v), int(hi_v)))
        return pd.DataFrame(
            rows, columns=["source", "quartile", "n_docs", "min_chars", "max_chars"]
        ).astype(
            {
                "quartile": np.int64,
                "n_docs": np.int64,
                "min_chars": np.int64,
                "max_chars": np.int64,
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(quartiles, batch_format="pandas")
    )


SQL_NTILE_CHARS_BY_SOURCE = """
WITH t AS (
  SELECT source, n_chars,
         NTILE(4) OVER (PARTITION BY source ORDER BY n_chars) AS quartile
  FROM documents)
SELECT source, CAST(quartile AS BIGINT) AS quartile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM t GROUP BY 1, 2
"""


QUERIES_QUANT = {
    "rolling_value_7d": q_rolling_value_7d,
    "chars_percentiles_by_lang": q_chars_percentiles_by_lang,
    "mode_event_per_user": q_mode_event_per_user,
    "ntile_chars_by_source": q_ntile_chars_by_source,
}

ORACLE_SQL_QUANT = {
    "rolling_value_7d": SQL_ROLLING_VALUE_7D,
    "chars_percentiles_by_lang": SQL_CHARS_PERCENTILES,
    "mode_event_per_user": SQL_MODE_EVENT_PER_USER,
    "ntile_chars_by_source": SQL_NTILE_CHARS_BY_SOURCE,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_QUANT)
_MAIN_SQL.update(ORACLE_SQL_QUANT)
