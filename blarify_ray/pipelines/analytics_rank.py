"""Collocation / duplication-stat / lag-window battery — three operator
shapes the earlier batteries don't cover, each DuckDB-oracle-checked:

- ``bigram_pmi_top``: collocation mining (phrase extraction for a
  training-data pipeline) — PMI-style lift over corpus bigrams, with the
  unigram counts attached by CO-PARTITIONED lookups (never broadcast:
  web-scale vocabularies don't fit a broadcast).
- ``cross_source_prefix_dups``: cross-partition duplication statistics
  — the "boilerplate header re-posted across sources" diagnostic of
  corpus dedup; one prefix-keyed exchange, distinct-source counting
  inside.
- ``user_event_gaps``: per-key LAG window (inter-event gaps) — the one
  window shape (lead/lag difference) the window battery lacked.

Self-registers into ``analytics.QUERIES/ORACLE_SQL`` at the bottom, same
contract as analytics_ext/analytics_win. NOTE: helpers from other
battery modules must be imported INSIDE functions (worker-side circular
import; see analytics_win's note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import _route, _t

RANK_PARTS = 64


# --- bigram_pmi_top (collocation mining: PMI-style lift) ---------------------

PMI_TOPK = 25
PMI_MIN_COUNT = 5


def q_bigram_pmi_top(sf_dir: str):
    """Top-k corpus bigrams by lift ``(N_bi · c_ab) / (c_a · c_b)`` —
    PMI's argument with the log dropped. Both products and the division
    are computed in DOUBLE in the SAME order on both sides (IEEE ops are
    deterministic → bit-identical to the SQL oracle; ``ln`` is not
    reproducible across libms, and an int64 product would silently wrap
    at web scale where ``n_bi · c_ab`` can exceed 2^63).

    Scale shape: per-batch value_counts partials for bigrams AND
    unigrams (vocab-scale rows leave each batch, not token-scale), one
    keyed exchange each; then the two unigram counts attach to the
    surviving (count ≥ ``PMI_MIN_COUNT``) bigrams via two co-partitioned
    lookups — the vocabulary is never broadcast and never lands on the
    driver. Final global sort+limit on the pruned bigram table."""
    from ..ops.joins import copartition_attach

    docs = _t(sf_dir, "documents", ["text"])

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["text"].notna()]
        vc = df["text"].str.split(" ").explode().value_counts()
        g = pd.DataFrame({"w": vc.index.astype(str), "c": vc.to_numpy(np.int64)})
        return _route(g, "w")

    # routed partial/merge, NOT groupby().aggregate over string keys —
    # the documented ~10x-slower path at vocabulary scale (CLAUDE.md)
    unigrams = (
        docs.map_batches(uni_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g.groupby("w", sort=False)["c"].sum().reset_index(),
            batch_format="pandas",
        )
    )

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["text"].notna()]
        s = df["text"].str.split(" ")
        parts = []
        for toks in s:
            if toks and len(toks) >= 2:
                a = np.asarray(toks, dtype=object)
                parts.append(
                    pd.Series(a[:-1]).str.cat(pd.Series(a[1:]), sep=" ")
                )
        if not parts:
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "c": pd.Series([], dtype=np.int64),
                                 "_pkey": pd.Series([], dtype="int32")})
        vc = pd.concat(parts, ignore_index=True).value_counts()
        g = pd.DataFrame(
            {"bigram": vc.index.astype(str), "c": vc.to_numpy(np.int64)}
        )
        return _route(g, "bigram")

    from ..util import compact_nonempty

    bigrams = compact_nonempty(
        docs.map_batches(bi_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g.groupby("bigram", sort=False)["c"]
            .sum()
            .reset_index()
            .rename(columns={"c": "c_ab"}),
            batch_format="pandas",
        )
    ).materialize()  # vocab-scale; consumed twice (sum + downstream)
    n_bi = bigrams.sum("c_ab") or 0

    def split_prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_ab"] >= PMI_MIN_COUNT].copy()
        ws = df["bigram"].str.split(" ", n=1, expand=True)
        if len(df) == 0:
            return pd.DataFrame(
                {"bigram": pd.Series([], dtype=str),
                 "w1": pd.Series([], dtype=str), "w2": pd.Series([], dtype=str),
                 "c_ab": pd.Series([], dtype=np.int64)}
            )
        df["w1"], df["w2"] = ws[0], ws[1]
        return df[["bigram", "w1", "w2", "c_ab"]]

    pruned = bigrams.map_batches(split_prune, batch_format="pandas")
    withA = copartition_attach(
        pruned, unigrams, "w1", "w", {"c": "c_a"}, partitions=RANK_PARTS
    )
    withB = copartition_attach(
        withA, unigrams, "w2", "w", {"c": "c_b"}, partitions=RANK_PARTS
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        num = np.float64(n_bi) * df["c_ab"].to_numpy(np.float64)
        den = df["c_a"].to_numpy(np.float64) * df["c_b"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "bigram": df["bigram"],
                "c_ab": df["c_ab"].to_numpy(np.int64),
                "lift": num / den,
            }
        )

    return (
        withB.map_batches(score, batch_format="pandas")
        .sort(["lift", "bigram"], descending=[True, False])
        .limit(PMI_TOPK)
    )


SQL_BIGRAM_PMI = f"""
WITH l AS (SELECT string_split(text, ' ') AS toks FROM documents
           WHERE text IS NOT NULL),
bg AS (
  SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM l WHERE len(toks) >= 2
),
bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY bigram
       HAVING COUNT(*) >= {PMI_MIN_COUNT}),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM
        (SELECT unnest(toks) AS w FROM l) GROUP BY w),
nbi AS (SELECT CAST(SUM(len(toks) - 1) AS BIGINT) AS n FROM l WHERE len(toks) >= 2)
SELECT bc.bigram, bc.c_ab,
       CAST(nbi.n AS DOUBLE) * CAST(bc.c_ab AS DOUBLE)
         / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS lift
FROM bc, nbi
JOIN uni ua ON ua.w = string_split(bc.bigram, ' ')[1]
JOIN uni ub ON ub.w = string_split(bc.bigram, ' ')[2]
ORDER BY lift DESC, bc.bigram LIMIT {PMI_TOPK}
"""

# --- cross_source_prefix_dups (boilerplate-header detector) -------------------

PREFIX_WORDS = 8


def q_cross_source_prefix_dups(sf_dir: str):
    """Document PREFIXES (first ``PREFIX_WORDS`` tokens) shared by ≥2
    DISTINCT sources, with how many sources and copies — the
    "boilerplate header re-posted across crawls" diagnostic of corpus
    dedup (exact-text dups are rare; shared headers are the common
    cross-source signal). One prefix-keyed exchange of per-batch
    distinct (prefix, source, count) partials — prefix-vocabulary-scale
    rows, never the document text — then a vectorized distinct-source
    count per hash partition."""
    docs = _t(sf_dir, "documents", ["text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["text"].notna()]
        pre = df["text"].str.split(" ").str[:PREFIX_WORDS].str.join(" ")
        g = (
            pd.DataFrame({"prefix": pre.astype(str), "source": df["source"].to_numpy()})
            .groupby(["prefix", "source"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return _route(g, "prefix")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("prefix", sort=False).agg(
            n_sources=("source", "nunique"), n_docs=("c", "sum")
        )
        agg = agg[agg["n_sources"] >= 2].reset_index()
        agg["n_sources"] = agg["n_sources"].astype(np.int64)
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        return agg[["prefix", "n_sources", "n_docs"]]

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


SQL_CROSS_SOURCE_PREFIX = f"""
SELECT array_to_string(string_split(text, ' ')[1:{PREFIX_WORDS}], ' ') AS prefix,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
WHERE text IS NOT NULL
GROUP BY prefix HAVING COUNT(DISTINCT source) >= 2
"""

# --- user_event_gaps (per-key LAG window: inter-event gaps) -------------------


def q_user_event_gaps(sf_dir: str):
    """Per-user inter-event gap statistics — the LAG(ts) OVER
    (PARTITION BY user ORDER BY ts) shape: gaps between consecutive
    events, summed and maxed per user (users with ≥2 events).

    Scale shape: ONE key-routed exchange of (user_id, ts_us) int pairs
    (the raw fact columns, fixed-width), then a vectorized sort + groupby
    diff per partition — gap values are invariant to tie order among
    equal timestamps, so the result is deterministic."""
    ev = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("int64"),
            }
        )
        return _route(out, "user_id")

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        d = g.groupby("user_id", sort=False)["ts_us"].diff()
        agg = pd.DataFrame({"user_id": g["user_id"], "gap": d}).groupby(
            "user_id", sort=False
        ).agg(n_m1=("gap", "count"), gap_sum_us=("gap", "sum"), max_gap_us=("gap", "max"))
        agg = agg[agg["n_m1"] >= 1].reset_index()
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy(np.int64),
                "n_events": (agg["n_m1"] + 1).to_numpy(np.int64),
                "gap_sum_us": agg["gap_sum_us"].to_numpy(np.int64),
                "max_gap_us": agg["max_gap_us"].to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(gaps, batch_format="pandas")
    )


SQL_USER_EVENT_GAPS = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(gap) AS BIGINT) AS gap_sum_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events)
GROUP BY user_id HAVING COUNT(*) >= 2
"""


# --- near_dup_pairs_exact (exact prefix-filtered set-similarity join) --------


def q_near_dup_pairs_exact(sf_dir: str):
    """Every document pair with word-4-gram Jaccard ≥ 0.5 →
    ``(d1, d2, jaccard)`` — the EXACT dedup tier
    (``ops/dedup.jaccard_pair_join``: df-ordered prefix filtering keeps
    hot grams out of the index, so the quadratic candidate blowup never
    happens; candidates verify on fetched texts via the size-tiered
    fetch machinery). ``minhash_dedup_docs`` is the probabilistic
    sibling; this one is oracle-checked against DuckDB's naive
    shared-gram join."""
    import os as _os

    import ray.data as _rd

    from ..ops.dedup import jaccard_pair_join

    docs = _rd.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return jaccard_pair_join(docs, "text", "doc_id", tau=0.5, shingle_words=4)


SQL_NEAR_DUP_PAIRS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, array_to_string(w[i.i:i.i+3], ' ') AS gram
  FROM toks CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i) i
  WHERE i.i <= len(w) - 3),
shd AS (SELECT DISTINCT doc_id, gram FROM sh),
sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ix
  FROM shd a JOIN shd b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT d1, d2, ix * 1.0 / (s1.n + s2.n - ix) AS jaccard
FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
WHERE ix * 1.0 / (s1.n + s2.n - ix) >= 0.5
"""


QUERIES_RANK = {
    "bigram_pmi_top": q_bigram_pmi_top,
    "cross_source_prefix_dups": q_cross_source_prefix_dups,
    "user_event_gaps": q_user_event_gaps,
    "near_dup_pairs_exact": q_near_dup_pairs_exact,
}

ORACLE_SQL_RANK = {
    "bigram_pmi_top": SQL_BIGRAM_PMI,
    "cross_source_prefix_dups": SQL_CROSS_SOURCE_PREFIX,
    "user_event_gaps": SQL_USER_EVENT_GAPS,
    "near_dup_pairs_exact": SQL_NEAR_DUP_PAIRS,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_RANK)
_MAIN_SQL.update(ORACLE_SQL_RANK)
