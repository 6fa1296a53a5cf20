"""Cohort / gaps-and-islands / set-similarity battery — three operator
shapes no earlier battery covers, each DuckDB-oracle-checked:

- ``cohort_retention``: the classic retention matrix (first-activity
  cohort × active period → distinct actors) — the two-pass "derive
  first-touch, re-attach, count distinct" shape every web-analytics
  pipeline runs.
- ``user_activity_streaks``: gaps-and-islands — longest run of
  consecutive active days per user (``d - row_number()`` grouping in
  SQL; vectorized run-boundary detection here).
- ``source_trigram_jaccard``: pairwise SET similarity between corpus
  partitions (word-trigram vocabulary Jaccard between sources) — the
  exact counterpart of MinHash's estimate, and the cross-source
  contamination diagnostic of corpus dedup.

Reference analog: the whole-graph/corpus diagnostics family
(``blarify/db_managers/queries.py`` aggregate helpers); re-expressed as
distributed Ray Data exchanges. Self-registers into
``analytics.QUERIES/ORACLE_SQL`` at the bottom, same contract as
analytics_ext/analytics_win/analytics_rank. NOTE: helpers from other
battery modules must be imported INSIDE functions (worker-side circular
import; see analytics_win's note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import _route, _t

_US_PER_DAY = 86_400_000_000


# --- cohort_retention (first-order-year cohort × active year) -----------------


def q_cohort_retention(sf_dir: str):
    """Retention matrix over orders: cohort = each customer's FIRST
    order year; for every (cohort_year, active_year) cell, how many
    distinct customers of that cohort placed an order that year.

    Scale shape: per-batch distinct (custkey, year) partials → ONE
    customer-keyed exchange; each hash partition owns whole customers,
    so cohort derivation (min year per customer) and the distinct count
    are partition-local and vectorized; the final exchange is
    cell-scale (#cohorts × #years rows)."""
    from ray.data.aggregate import Sum

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "cust": df["o_custkey"].to_numpy(np.int64),
                "year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            }
        ).drop_duplicates()
        return _route(out, "cust")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["cust", "year"])
        cohort = g.groupby("cust", sort=False)["year"].transform("min")
        cells = (
            pd.DataFrame({"cohort": cohort, "year": g["year"]})
            .groupby(["cohort", "year"], sort=False)
            .size()
            .reset_index(name="n")
        )
        # customers are whole within a partition → partition-local
        # distinct counts are globally disjoint; cells just sum.
        return pd.DataFrame(
            {
                "cohort_year": cells["cohort"].astype(str),
                "active_year": cells["year"].astype(str),
                "n": cells["n"].to_numpy(np.int64),
            }
        )

    return (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
        .groupby(["cohort_year", "active_year"])
        .aggregate(Sum("n", alias_name="n_customers"))
    )


SQL_COHORT_RETENTION = """
WITH firsts AS (
  SELECT o_custkey, MIN(strftime(o_orderdate, '%Y')) AS cohort_year
  FROM orders GROUP BY o_custkey)
SELECT f.cohort_year, strftime(o.o_orderdate, '%Y') AS active_year,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2
"""

# --- user_activity_streaks (gaps-and-islands) ---------------------------------


def q_user_activity_streaks(sf_dir: str):
    """Per-user active-day statistics: number of distinct active days
    and the longest run of CONSECUTIVE active days (gaps-and-islands).

    Scale shape: per-batch distinct (user, epoch_day) int pairs → ONE
    user-keyed exchange → per-partition vectorized run detection (sort,
    boundary mask where the user changes or the day step ≠ 1, cumsum
    run ids, one groupby) — no per-user Python loop."""
    ev = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "d": df["ts"].astype("int64").to_numpy() // _US_PER_DAY,
            }
        ).drop_duplicates()
        return _route(out, "user_id")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.drop_duplicates(["user_id", "d"])
            .sort_values(["user_id", "d"], kind="mergesort")
        )
        u = g["user_id"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        boundary = np.ones(len(g), dtype=bool)
        boundary[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        run_id = np.cumsum(boundary)
        runs = (
            pd.DataFrame({"user_id": u, "run": run_id})
            .groupby(["user_id", "run"], sort=False)
            .size()
            .reset_index(name="len")
        )
        agg = runs.groupby("user_id", sort=False)["len"].agg(["sum", "max"])
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(np.int64),
                "n_active_days": agg["sum"].to_numpy(np.int64),
                "max_streak": agg["max"].to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


SQL_USER_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
  FROM events),
g AS (SELECT user_id, d,
             d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days),
runs AS (SELECT user_id, grp, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_active_days,
       CAST(MAX(cnt) AS BIGINT) AS max_streak
FROM runs GROUP BY user_id
"""

# --- source_trigram_jaccard (pairwise vocabulary set similarity) --------------


def q_source_trigram_jaccard(sf_dir: str):
    """Exact pairwise Jaccard similarity between sources over their
    word-TRIGRAM vocabularies — the exact quantity MinHash estimates,
    and the "how much does crawl A plagiarise crawl B" diagnostic.

    Scale shape: per-batch distinct (source, trigram) partials
    (vectorized trigram construction via explode + shifted string
    concat) → ONE trigram-keyed exchange; each partition owns whole
    trigrams, so per-source set sizes and per-pair intersection counts
    are partition-local (vectorized self-merge on the trigram) and sum
    across partitions; the final table is pair-scale (≤ S² rows for S
    sources), where the Jaccard division happens. Raw text never
    shuffles; the exchange carries distinct trigram rows only."""
    from ray.data.aggregate import Sum

    docs = _t(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ex = df["text"].str.split(" ").explode().dropna()
        pos = ex.index.to_numpy(np.int64)
        tok = ex.to_numpy(object)
        empty = pd.DataFrame(
            {"source": pd.Series([], dtype=str), "w": pd.Series([], dtype=str)}
        )
        if len(tok) < 3:
            return _route(empty, "w")
        same_doc = (pos[:-2] == pos[2:])
        tri = (
            pd.Series(tok[:-2], dtype=str)
            .str.cat(pd.Series(tok[1:-1], dtype=str), sep=" ")
            .str.cat(pd.Series(tok[2:], dtype=str), sep=" ")
        )
        out = pd.DataFrame(
            {
                "source": df["source"].to_numpy()[pos[:-2]],
                "w": tri.to_numpy(object),
            }
        )[same_doc].drop_duplicates()
        if len(out) == 0:
            return _route(empty, "w")
        return _route(out, "w")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["source", "w"])
        sz = g.groupby("source", sort=False).size().reset_index(name="n")
        sizes = pd.DataFrame(
            {"src_a": sz["source"].astype(str), "src_b": "",
             "n": sz["n"].to_numpy(np.int64)}
        )
        m = g.merge(g, on="w")
        m = m[m["source_x"] < m["source_y"]]
        pr = (
            m.groupby(["source_x", "source_y"], sort=False)
            .size()
            .reset_index(name="n")
        )
        pairs = pd.DataFrame(
            {"src_a": pr["source_x"].astype(str),
             "src_b": pr["source_y"].astype(str),
             "n": pr["n"].to_numpy(np.int64)}
        )
        return pd.concat([sizes, pairs], ignore_index=True)

    agg = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    # pair-scale result (≤ S² + S rows): assemble the Jaccard on the
    # driver from the aggregated cells.
    cells = agg.to_pandas()
    set_n = dict(
        zip(cells.loc[cells["src_b"] == "", "src_a"],
            cells.loc[cells["src_b"] == "", "n"])
    )
    pairs = cells[cells["src_b"] != ""].copy()
    na = pairs["src_a"].map(set_n).to_numpy(np.int64)
    nb = pairs["src_b"].map(set_n).to_numpy(np.int64)
    n_common = pairs["n"].to_numpy(np.int64)
    n_union = na + nb - n_common
    return pd.DataFrame(
        {
            "src_a": pairs["src_a"].astype(str),
            "src_b": pairs["src_b"].astype(str),
            "n_common": n_common,
            "n_union": n_union,
            "jaccard": n_common.astype(np.float64) / n_union.astype(np.float64),
        }
    ).reset_index(drop=True)


SQL_SOURCE_TRIGRAM_JACCARD = """
WITH l AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
sw AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS w
  FROM l WHERE len(toks) >= 3),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sw GROUP BY source),
ix AS (SELECT a.source AS src_a, b.source AS src_b,
              CAST(COUNT(*) AS BIGINT) AS n_common
       FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
       GROUP BY 1, 2)
SELECT ix.src_a, ix.src_b, ix.n_common,
       za.n + zb.n - ix.n_common AS n_union,
       CAST(ix.n_common AS DOUBLE) / CAST(za.n + zb.n - ix.n_common AS DOUBLE)
         AS jaccard
FROM ix
JOIN sz za ON za.source = ix.src_a
JOIN sz zb ON zb.source = ix.src_b
"""


QUERIES_COHORT = {
    "cohort_retention": q_cohort_retention,
    "user_activity_streaks": q_user_activity_streaks,
    "source_trigram_jaccard": q_source_trigram_jaccard,
}

ORACLE_SQL_COHORT = {
    "cohort_retention": SQL_COHORT_RETENTION,
    "user_activity_streaks": SQL_USER_STREAKS,
    "source_trigram_jaccard": SQL_SOURCE_TRIGRAM_JACCARD,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_COHORT)
_MAIN_SQL.update(ORACLE_SQL_COHORT)
