"""Sequence-packing battery — the concat-and-chunk step that turns a
cleaned document corpus into fixed-length training sequences (the
GPT-style "tokenize, concatenate everything, cut every L tokens" data
prep), expressed as a distributed exact prefix sum and DuckDB-oracle
checked:

- ``pack_chunks_docs``: for every document, its token count, its exact
  offset in the global concatenated token stream (docs in ``doc_id``
  order), and the first/last training chunk (of ``PACK_CHUNK_TOKENS``
  tokens) the document lands in. Downstream, a writer that owns chunk
  range [a, b) knows exactly which documents to read — the mapping IS
  the pack plan.

Scale shape — a global ORDER-BY-id prefix sum with bounded driver
state: documents are range-bucketed on ``doc_id`` into a FIXED number
of buckets (``PACK_N_BUCKETS``, driver state = one int64 per bucket
regardless of corpus size); pass A computes per-bucket token sums
(per-batch partials, driver merge of batch×bucket-scale rows — the
DEDUP_DRIVER_MERGE_MAX pattern), the driver cumsums 4096 numbers into
per-bucket base offsets, and pass B routes rows by bucket through ONE
exchange and finishes each bucket with a vectorized within-bucket
cumsum + base. Document text never shuffles — only (doc_id, n_tokens)
int rows move. Range bucketing by id assumes ids spread over their
range (true for crawl sequence numbers); arbitrary key domains would
swap in KLL-quantile range bounds (``ops/sketches.QuantileSketch``).

Reference analog: the reference materializes its graph in sorted,
batched sink writes (``blarify/repositories/graph_db_manager/
neo4j_manager.py:96-107`` batch slicing); this is the training-corpus
form where the batch boundary is a token budget, not a row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import _WS_SPLIT, _route, _t

#: tokens per training sequence (the pack target length)
PACK_CHUNK_TOKENS = 512
#: fixed bucket count for the distributed prefix sum — driver state is
#: one int64 per bucket at ANY corpus size
PACK_N_BUCKETS = 4096


def q_pack_chunks_docs(sf_dir: str):
    """Exact concat-and-chunk pack plan over ``documents`` in doc_id
    order: (doc_id, n_tokens, start_tok, chunk_first, chunk_last) with
    ``start_tok`` = Σ n_tokens of all lower-id docs and chunks of
    ``PACK_CHUNK_TOKENS`` whitespace tokens. Token semantics are
    identical to ``token_counts`` (strip + whitespace split — empty
    text counts 1, like the SQL's regexp_split_to_array)."""
    ids = _t(sf_dir, "documents", ["doc_id"])
    max_id = int(ids.max("doc_id") or 0)  # pruned int-column scan
    width = max(1, (max_id + PACK_N_BUCKETS) // PACK_N_BUCKETS)

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        n = np.fromiter(
            (len(_WS_SPLIT.split(x.strip(" \t\n"))) for x in df["text"]),
            np.int64,
            count=len(df),
        )
        d = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": d, "n_tokens": n, "bucket": (d // width).astype(np.int64)}
        )

    # the (doc_id, n_tokens, bucket) int table is consumed by BOTH
    # passes — materialize it so the corpus text is scanned exactly
    # once (16 B/doc in the object store, not the corpus)
    tok = docs.map_batches(toks, batch_format="pandas").materialize()

    # pass A: per-bucket token sums → driver cumsum (bucket-scale).
    # partial rows are ≤ buckets-touched-per-batch (id-clustered parquet
    # touches ~1), merged on the driver like the other partial merges
    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("bucket", sort=False)["n_tokens"].sum().reset_index()
        return pd.DataFrame(
            {
                "bucket": s["bucket"].to_numpy(np.int64),
                "tok": s["n_tokens"].to_numpy(np.int64),
            }
        )

    parts = tok.map_batches(bucket_partial, batch_format="pandas").to_pandas()
    sums = np.zeros(PACK_N_BUCKETS + 1, np.int64)
    if len(parts):
        np.add.at(sums, parts["bucket"].to_numpy(np.int64), parts["tok"].to_numpy(np.int64))
    base = np.zeros(PACK_N_BUCKETS + 1, np.int64)
    base[1:] = np.cumsum(sums[:-1])  # tokens in all LOWER buckets

    # pass B: one bucket-keyed exchange; within-bucket vectorized cumsum
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "doc_id"], kind="mergesort")
        b = g["bucket"].to_numpy(np.int64)
        n = g["n_tokens"].to_numpy(np.int64)
        cs = np.cumsum(n) - n  # partition-order prefix (before-row)
        new = np.ones(len(g), dtype=bool)
        new[1:] = b[1:] != b[:-1]
        first_cs = cs[np.maximum.accumulate(np.where(new, np.arange(len(g)), 0))]
        start = base[b] + (cs - first_cs)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "start_tok": start,
                "chunk_first": start // PACK_CHUNK_TOKENS,
                "chunk_last": (start + n - 1) // PACK_CHUNK_TOKENS,
            }
        )

    return (
        tok.map_batches(lambda df: _route(df, "bucket"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(finish, batch_format="pandas")
    )


SQL_PACK_CHUNKS = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10)), '[ \t\n]+')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM t)
SELECT doc_id, n_tokens, start_tok,
       start_tok // {PACK_CHUNK_TOKENS} AS chunk_first,
       (start_tok + n_tokens - 1) // {PACK_CHUNK_TOKENS} AS chunk_last
FROM c
"""


QUERIES_PACK = {
    "pack_chunks_docs": q_pack_chunks_docs,
}

ORACLE_SQL_PACK = {
    "pack_chunks_docs": SQL_PACK_CHUNKS,
}

from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_PACK)
_MAIN_SQL.update(ORACLE_SQL_PACK)
