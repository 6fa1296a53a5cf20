"""Training-export battery — the last mile of an LLM data pipeline,
DuckDB-oracle checked:

- ``shuffle_shards_docs``: a deterministic seeded GLOBAL shuffle of the
  corpus plus the shard/position plan a training-data writer consumes —
  for every document its shuffle key, its exact global position in
  shuffled order, and the fixed-size output shard it lands in. This is
  the "shuffle globally, then write N-doc shards" step that follows
  cleaning/packing in every large-corpus prep flow.
- ``fuzzy_contamination``: near-duplicate benchmark decontamination —
  flags (doc, benchmark-snippet) pairs whose DISTINCT-token containment
  |snippet ∩ doc| / |snippet| clears a threshold, the relaxation of
  ``benchmark_contamination``'s verbatim contains-scan that survives
  small edits (the n-gram-overlap decontamination from the GPT-3/PaLM
  appendix methodology, expressed over token sets so the oracle can
  state the identical join).

Scale shapes:

- ``shuffle_shards_docs`` is the ``analytics_pack`` bounded-driver
  prefix sum transplanted onto the HASH domain: keys are uniform by
  construction, so fixed-width key-range buckets are balanced without
  sampling. Pass A reduces to ``EXPORT_N_BUCKETS`` int64 counts on the
  driver (constant state at any corpus size); pass B routes (doc_id,
  key) int rows — never text — through ONE exchange and ranks within
  buckets vectorized. A writer that owns shard s reads only the rows
  with ``shard_id == s``: resumable, partitioned output by
  construction.
- ``fuzzy_contamination`` broadcasts a benchmark-scale inverted index
  (token → snippet ids, built once with ``ray.put``) and streams the
  corpus map-only: per batch, docs explode to DISTINCT (doc, token)
  pairs that merge against the index vectorized — no corpus-side
  shuffle, no pairwise doc×snippet loop. Benchmark suites are ~10^5
  snippets at any corpus size, so the broadcast side is constant.

Reference analog: the reference materializes query results in sorted
batched pages (``blarify/repositories/graph_db_manager/
neo4j_manager.py:96-107``); the shard plan is that boundary discipline
applied to a token-training corpus. The decontamination scan extends
``analytics_ext.q_benchmark_contamination``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray as _ray

from .analytics import _WS_SPLIT, ROUTE_PARTS, _route, _t

#: documents per output shard (the writer's unit of work / resume)
EXPORT_SHARD_DOCS = 100
#: fixed bucket count for the hash-range prefix sum — driver state is
#: one int64 per bucket at ANY corpus size
EXPORT_N_BUCKETS = 4096
#: Knuth multiplicative hash on the 2^32 ring — SQL-expressible; the
#: engine computes in uint64 ((a*b) mod 2^64) mod 2^32 == (a*b) mod
#: 2^32, so wraparound matches DuckDB's exact HUGEINT arithmetic even
#: for doc_id far beyond 2^32
_SHUFFLE_MULT = 2654435761
_SHUFFLE_MOD = 4294967296

#: every FUZZY_MOD-th doc donates a snippet (benchmark-scale set)
FUZZY_MOD = 41
#: words per snippet (leading words of the donor doc)
FUZZY_WORDS = 8
#: containment threshold as an exact integer ratio: 10*common >= 8*|snippet|
FUZZY_NUM, FUZZY_DEN = 8, 10


def q_shuffle_shards_docs(sf_dir: str):
    """Deterministic global-shuffle export plan over ``documents``:
    (doc_id, shuffle_key, pos, shard_id) where ``pos`` is the exact
    rank under ORDER BY (shuffle_key, doc_id) and ``shard_id = pos //
    EXPORT_SHARD_DOCS``. Same two-pass bounded-driver prefix sum as
    ``pack_chunks_docs``, bucketed on the uniform hash range instead of
    the id range."""
    width = _SHUFFLE_MOD // EXPORT_N_BUCKETS  # exact: 2^32 / 2^12

    docs = _t(sf_dir, "documents", ["doc_id"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        h = (d.astype(np.uint64) * np.uint64(_SHUFFLE_MULT)) % np.uint64(_SHUFFLE_MOD)
        h = h.astype(np.int64)  # < 2^32, exact in int64
        return pd.DataFrame({"doc_id": d, "shuffle_key": h, "bucket": h // width})

    # 24 B/doc int table consumed by both passes — one corpus-column scan
    keyed = docs.map_batches(key, batch_format="pandas").materialize()

    # pass A: per-bucket row counts → driver cumsum (bucket-scale)
    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("bucket", sort=False).size().reset_index(name="n")
        return pd.DataFrame(
            {"bucket": s["bucket"].to_numpy(np.int64), "n": s["n"].to_numpy(np.int64)}
        )

    parts = keyed.map_batches(bucket_partial, batch_format="pandas").to_pandas()
    counts = np.zeros(EXPORT_N_BUCKETS + 1, np.int64)
    if len(parts):
        np.add.at(counts, parts["bucket"].to_numpy(np.int64), parts["n"].to_numpy(np.int64))
    base = np.zeros(EXPORT_N_BUCKETS + 1, np.int64)
    base[1:] = np.cumsum(counts[:-1])  # rows in all LOWER hash buckets

    # pass B: one bucket-keyed exchange; within-bucket vectorized rank.
    # a _pkey group may hold several buckets — rank per bucket run
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "shuffle_key", "doc_id"], kind="mergesort")
        b = g["bucket"].to_numpy(np.int64)
        idx = np.arange(len(g), dtype=np.int64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = b[1:] != b[:-1]
        first = idx[np.maximum.accumulate(np.where(new, idx, 0))]
        pos = base[b] + (idx - first)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "shuffle_key": g["shuffle_key"].to_numpy(np.int64),
                "pos": pos,
                "shard_id": pos // EXPORT_SHARD_DOCS,
            }
        )

    return (
        keyed.map_batches(lambda df: _route(df, "bucket"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(finish, batch_format="pandas")
    )


SQL_SHUFFLE_SHARDS = f"""
WITH k AS (
  SELECT doc_id,
         CAST((CAST(doc_id AS HUGEINT) * {_SHUFFLE_MULT}) % {_SHUFFLE_MOD}
              AS BIGINT) AS shuffle_key
  FROM documents),
r AS (
  SELECT doc_id, shuffle_key,
         ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1 AS pos
  FROM k)
SELECT doc_id, shuffle_key, CAST(pos AS BIGINT) AS pos,
       CAST(pos // {EXPORT_SHARD_DOCS} AS BIGINT) AS shard_id
FROM r
"""


def _doc_tokens(texts: pd.Series, limit: int | None = None) -> pd.Series:
    """DISTINCT whitespace tokens per row (list), matching the SQL's
    regexp_split_to_array(trim(...)) with '' tokens dropped; ``limit``
    keeps only the first N tokens BEFORE dedup (snippet derivation)."""
    toks = texts.fillna("").str.strip(" \t\n").map(_WS_SPLIT.split)
    if limit is not None:
        toks = toks.map(lambda ts: ts[:limit])
    return toks.map(lambda ts: sorted({t for t in ts if t}))


def q_fuzzy_contamination(sf_dir: str):
    """Near-dup decontamination: (doc_id, bench_id, n_common,
    containment) for every (corpus doc, benchmark snippet) pair whose
    DISTINCT-token containment |snippet ∩ doc| / |snippet| >=
    FUZZY_NUM/FUZZY_DEN, thresholded in exact integer arithmetic on
    both sides. Snippets are the first FUZZY_WORDS words of every
    FUZZY_MOD-th doc (so the oracle derives the identical set);
    zero-token snippets match nothing by construction."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def snippet_partial(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df["doc_id"] % FUZZY_MOD == 0]
        toks = _doc_tokens(sel["text"], limit=FUZZY_WORDS)
        out = pd.DataFrame({"bench_id": sel["doc_id"].to_numpy(np.int64), "toks": toks})
        out = out.explode("toks").dropna(subset=["toks"])
        return pd.DataFrame(
            {"bench_id": out["bench_id"].to_numpy(np.int64), "tok": out["toks"].astype(str)}
        )

    bench = docs.map_batches(snippet_partial, batch_format="pandas").take_all()
    # benchmark-scale by construction (|docs| / FUZZY_MOD snippets)
    btok = pd.DataFrame(
        {"bench_id": [r["bench_id"] for r in bench], "tok": [r["tok"] for r in bench]}
    )
    bsz = btok.groupby("bench_id").size()
    index_ref = _ray.put((btok, bsz.index.to_numpy(np.int64), bsz.to_numpy(np.int64)))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        from ..util import get_broadcast

        bt, bid, bn = get_broadcast(index_ref)
        if not len(bt) or not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "bench_id": pd.Series([], dtype=np.int64),
                    "n_common": pd.Series([], dtype=np.int64),
                    "containment": pd.Series([], dtype=np.float64),
                }
            )
        d = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                          "toks": _doc_tokens(df["text"])})
        d = d.explode("toks").dropna(subset=["toks"]).rename(columns={"toks": "tok"})
        hits = d.merge(bt, on="tok", how="inner")
        g = hits.groupby(["doc_id", "bench_id"], sort=False).size().reset_index(name="n_common")
        sz = pd.Series(bn, index=bid)
        g["bsz"] = sz.loc[g["bench_id"]].to_numpy(np.int64)
        g = g[g["n_common"] * FUZZY_DEN >= g["bsz"] * FUZZY_NUM]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "bench_id": g["bench_id"].to_numpy(np.int64),
                "n_common": g["n_common"].to_numpy(np.int64),
                "containment": g["n_common"].to_numpy(np.float64)
                / g["bsz"].to_numpy(np.float64),
            }
        )

    return docs.map_batches(scan, batch_format="pandas")


SQL_FUZZY_CONTAMINATION = f"""
WITH btok AS (
  SELECT DISTINCT doc_id AS bench_id, tok
  FROM (SELECT doc_id,
               unnest((regexp_split_to_array(
                 trim(text, ' ' || chr(9) || chr(10)), '[ \t\n]+'))[1:{FUZZY_WORDS}]) AS tok
        FROM documents WHERE doc_id % {FUZZY_MOD} = 0)
  WHERE tok <> ''),
bsz AS (SELECT bench_id, COUNT(*) AS sz FROM btok GROUP BY bench_id),
dtok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(
                 trim(text, ' ' || chr(9) || chr(10)), '[ \t\n]+')) AS tok
        FROM documents)
  WHERE tok <> ''),
hits AS (
  SELECT d.doc_id, b.bench_id, COUNT(*) AS n_common
  FROM dtok d JOIN btok b USING (tok)
  GROUP BY d.doc_id, b.bench_id)
SELECT h.doc_id, h.bench_id, CAST(h.n_common AS BIGINT) AS n_common,
       h.n_common * 1.0 / s.sz AS containment
FROM hits h JOIN bsz s USING (bench_id)
WHERE h.n_common * {FUZZY_DEN} >= s.sz * {FUZZY_NUM}
"""


#: window length for the span-removal cleanup (matches analytics_win's
#: ngram_span_dups removal LIST so list and cleanup agree)
SPAN_RM_TOKENS = 8


def q_span_removed_docs(sf_dir: str):
    """Exact-substring dedup APPLIED (the ExactSubstr cleanup): every
    duplicated SPAN_RM_TOKENS-token window excised except the
    corpus-wide first occurrence; (doc_id, text_clean, n_removed) for
    every doc. The engine ships (hash, id, pos) ints through the gram
    exchange and text through ONE co-partitioned excision exchange; the
    oracle restates the whole surgery over literal grams."""
    from ..ops.dedup import ngram_span_removal

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_span_removal(docs, "text", "doc_id", n_tokens=SPAN_RM_TOKENS)
    return out.map_batches(
        lambda df: df.rename(columns={"id": "doc_id"}), batch_format="pandas"
    )


SQL_SPAN_REMOVED = f"""
WITH d AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks FROM documents),
w AS (
  SELECT doc_id, gs.i - 1 AS pos,
         array_to_string(toks[gs.i : gs.i + {SPAN_RM_TOKENS - 1}], ' ') AS gram
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, len(toks) - {SPAN_RM_TOKENS - 1})) AS i) gs),
q AS (SELECT gram FROM w GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 1000),
m AS (
  SELECT doc_id, pos FROM (
    SELECT w.doc_id, w.pos,
           ROW_NUMBER() OVER (PARTITION BY w.gram ORDER BY w.doc_id, w.pos) AS rn
    FROM w JOIN q USING (gram))
  WHERE rn > 1),
r AS (
  SELECT DISTINCT m.doc_id, u.p FROM m, LATERAL (
    SELECT unnest(generate_series(m.pos, m.pos + {SPAN_RM_TOKENS - 1})) AS p) u),
t AS (
  SELECT doc_id, toks[gs.i] AS tok, gs.i - 1 AS pos
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) gs),
kept AS (
  SELECT t.doc_id, t.tok, t.pos FROM t
  LEFT JOIN r ON t.doc_id = r.doc_id AND t.pos = r.p
  WHERE r.p IS NULL)
SELECT d.doc_id,
       COALESCE(k.txt, '') AS text_clean,
       CAST(len(d.toks) - COALESCE(k.cnt, 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt, COUNT(*) AS cnt
  FROM kept GROUP BY doc_id) k USING (doc_id)
"""


#: tokens per non-overlapping block for the paragraph-granularity dedup
BLOCK_TOKENS = 6


def q_block_dedup_docs(sf_dir: str):
    """Block-level dedup — the RefinedWeb/C4 paragraph-dedup step at the
    granularity this corpus affords: each doc splits into consecutive
    NON-overlapping BLOCK_TOKENS-token blocks (last block may be short);
    every block whose content appears anywhere earlier in the corpus
    (ordered by doc_id, block index — within-doc repeats included,
    unlike the distinct-doc rule of ``span_removed_docs``) is excised.
    Returns (doc_id, text_clean, n_blocks, n_removed) for every doc.

    Scale shape: blocks travel the dedup exchange as (hash64, doc_id,
    idx) int rows — text never shuffles with them; the winner per hash
    is the lexicographic (doc_id, idx) min, resolved vectorized per
    hash-routed group; excision is ONE doc-routed exchange where the
    loser (doc_id, idx) markers co-partition with the doc text."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def split_blocks(text: str) -> list[str]:
        toks = (text or "").split(" ")
        return [
            " ".join(toks[i : i + BLOCK_TOKENS])
            for i in range(0, len(toks), BLOCK_TOKENS)
        ]

    def block_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, blks = [], [], []
        for did, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            bs = split_blocks(text)
            ids.extend([did] * len(bs))
            idxs.extend(range(len(bs)))
            blks.extend(bs)
        # md5-128 content identity (NOT a 64-bit convenience hash): a
        # collision here would silently excise a non-duplicate block,
        # diverging from the oracle's exact content-equality partition —
        # same contract as exact_dedup_docs. Routing uses the digest's
        # first 8 bytes; identity comparison uses all 16.
        digs = [hashlib.md5(b.encode("utf-8", "surrogatepass")).digest() for b in blks]
        hi = (
            np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(-1, 2)[:, 0]
            if digs
            else np.empty(0, np.uint64)
        )
        out = pd.DataFrame(
            {
                "bh": pd.Series(digs, dtype=object),
                "doc_id": np.asarray(ids, np.int64),
                "idx": np.asarray(idxs, np.int64),
            }
        )
        out["bucket"] = (hi % np.uint64(ROUTE_PARTS)).astype(np.int64)
        return out

    rows = docs.map_batches(block_rows, batch_format="pandas")

    # winner per block hash = (doc_id, idx) min; emit LOSERS only
    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bh", "doc_id", "idx"], kind="mergesort")
        first = ~g["bh"].duplicated()
        out = g.loc[~first, ["doc_id", "idx"]]
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(np.int64),
                "idx": out["idx"].to_numpy(np.int64),
            }
        )

    dup = (
        rows.map_batches(lambda df: _route(df, "bucket"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(losers, batch_format="pandas")
    )

    # excision: doc text + its loser markers co-partition by doc_id
    def mark_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "idx": np.int64(-1),
                "text": df["text"].fillna("").astype(str),
            }
        )
        return _route(out, "doc_id")

    def mark_dup(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "idx": df["idx"].to_numpy(np.int64),
                "text": "",
            }
        )
        return _route(out, "doc_id")

    unioned = docs.map_batches(mark_doc, batch_format="pandas").union(
        dup.map_batches(mark_dup, batch_format="pandas")
    )

    def excise(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["idx"] < 0]
        drops: dict[int, set] = {}
        dd = g[g["idx"] >= 0]
        for did, i in zip(dd["doc_id"].to_numpy(np.int64), dd["idx"].to_numpy(np.int64)):
            drops.setdefault(did, set()).add(int(i))
        out_id, out_txt, out_nb, out_rm = [], [], [], []
        for did, text in zip(texts["doc_id"].to_numpy(np.int64), texts["text"]):
            bs = split_blocks(text)
            gone = drops.get(did, ())
            kept = [b for i, b in enumerate(bs) if i not in gone]
            out_id.append(did)
            out_txt.append(" ".join(kept))
            out_nb.append(len(bs))
            out_rm.append(len(bs) - len(kept))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, np.int64),
                "text_clean": pd.Series(out_txt, dtype=str),
                "n_blocks": np.asarray(out_nb, np.int64),
                "n_removed": np.asarray(out_rm, np.int64),
            }
        )

    return unioned.groupby("_pkey").map_groups(excise, batch_format="pandas")


SQL_BLOCK_DEDUP = f"""
WITH d AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks FROM documents),
nb AS (
  SELECT doc_id, toks,
         CAST(ceil(len(toks) / {BLOCK_TOKENS}.0) AS BIGINT) AS n_blocks
  FROM d),
b AS (
  SELECT doc_id, gs.i AS bi,
         array_to_string(
           toks[(gs.i * {BLOCK_TOKENS} + 1) : (gs.i * {BLOCK_TOKENS} + {BLOCK_TOKENS})],
           ' ') AS blk
  FROM nb, LATERAL (SELECT unnest(generate_series(0, n_blocks - 1)) AS i) gs),
w AS (
  SELECT doc_id, bi, blk,
         ROW_NUMBER() OVER (PARTITION BY blk ORDER BY doc_id, bi) AS rn
  FROM b),
kept AS (
  SELECT doc_id, string_agg(blk, ' ' ORDER BY bi) AS txt, COUNT(*) AS cnt
  FROM w WHERE rn = 1 GROUP BY doc_id)
SELECT nb.doc_id,
       COALESCE(k.txt, '') AS text_clean,
       nb.n_blocks,
       nb.n_blocks - COALESCE(k.cnt, 0) AS n_removed
FROM nb LEFT JOIN kept k USING (doc_id)
"""


def write_training_shards(
    sf_dir: str, out_dir: str, force: bool = False
) -> dict:
    """Materialize the ``shuffle_shards_docs`` plan: one hive partition
    directory per shard (``shard_id=N/``) holding (doc_id, pos, text),
    the unit a training-data writer consumes and the unit of resume.

    Scale shape: the plan rows join their text via ONE co-partitioned
    doc_id exchange (text moves exactly once), and the hive write splits
    each batch across its shard dirs — no extra shuffle (the
    ``edges_by_dst`` discipline). Resumable: the writer fingerprints the
    input (path + size + mtime of ``documents.parquet``) into a marker
    file; a rerun with a matching marker SKIPS the write entirely, and a
    changed input rewrites into a fresh tmp dir swapped in atomically —
    a crashed run can never leave a half-written layout behind the
    marker."""
    import json
    import os
    import shutil

    from ..ops.joins import copartition_attach

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fingerprint = f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}"
    marker = os.path.join(out_dir, "_SHARDS_OK.json")
    if not force and os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fingerprint:
            return {**meta, "skipped": True}

    plan = q_shuffle_shards_docs(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    joined = copartition_attach(
        plan, docs, "doc_id", "doc_id", {"text": "text"}
    ).map_batches(
        lambda df: df[["doc_id", "pos", "shard_id", "text"]],
        batch_format="pandas",
    )

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    joined.write_parquet(tmp, partition_cols=["shard_id"])
    n_shards = sum(1 for d in os.listdir(tmp) if d.startswith("shard_id="))
    meta = {"fingerprint": fingerprint, "n_shards": n_shards, "skipped": False}
    with open(os.path.join(tmp, "_SHARDS_OK.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return meta


# --- PII redaction (the RefinedWeb/Pile scrubbing stage) ---------------------
#
# Patterns restricted to syntax with IDENTICAL semantics in Python re and
# DuckDB's RE2 (character classes, bounded repeats, ASCII \b) so engine
# and oracle state the same scrub. Applied in a fixed order (email →
# phone → IP); match counts are taken on the ORIGINAL text on both sides.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_redact_docs(sf_dir: str):
    """PII scrub over ``documents``: emails → ``<EMAIL>``, NANP-style
    phone numbers → ``<PHONE>``, dotted-quad IPs → ``<IP>``; returns
    (doc_id, text_redacted, n_emails, n_phones, n_ips). Map-only — one
    corpus scan, compiled-regex vectorized pandas kernels, nothing
    shuffles; the 100-TB shape is embarrassingly parallel."""
    import re

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    # re.ASCII: Python's \d/\b are Unicode-aware by default, RE2's are
    # ASCII — without this flag engine and oracle diverge on unicode docs
    rx_e = re.compile(PII_EMAIL, re.ASCII)
    rx_p = re.compile(PII_PHONE, re.ASCII)
    rx_i = re.compile(PII_IP, re.ASCII)

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("").astype(str)
        n_e = s.str.count(rx_e).astype(np.int64)
        n_p = s.str.count(rx_p).astype(np.int64)
        n_i = s.str.count(rx_i).astype(np.int64)
        red = (
            s.str.replace(rx_e, "<EMAIL>", regex=True)
            .str.replace(rx_p, "<PHONE>", regex=True)
            .str.replace(rx_i, "<IP>", regex=True)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "text_redacted": red,
                "n_emails": n_e,
                "n_phones": n_p,
                "n_ips": n_i,
            }
        )

    return docs.map_batches(scrub, batch_format="pandas")


SQL_PII_REDACT = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
         COALESCE(text, ''), '{PII_EMAIL}', '<EMAIL>', 'g'),
         '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_IP}', '<IP>', 'g') AS text_redacted,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{PII_IP}')) AS BIGINT) AS n_ips
FROM documents
"""


# --- negative sampling (contrastive-training prep) ---------------------------

#: negatives proposed per positive pair
NEG_K = 2
#: range buckets for the distributed part-rank prefix sum
NEG_RANK_BUCKETS = 4096


def q_negative_samples(sf_dir: str):
    """Deterministic negative sampling over the order→part bipartite
    graph — the skip-gram / GNN contrastive-training prep step: for each
    DISTINCT positive (order, part) and j ∈ 1..NEG_K, propose candidate
    rank ((o·31 + p + j·97) mod 2³² · 2654435761 mod 2³²) mod n_parts,
    map the rank to its part id, and DROP proposals that collide with a
    true positive of the same order (no retry — the dropped-row set is
    part of the spec so the oracle can state the identical sampler).
    Output: (l_orderkey, pos_part, j, neg_part). All arithmetic is
    wrap-defined mod 2³² so uint64 engine math equals DuckDB HUGEINT.

    Scale shape: the part-rank table comes from the bounded-driver
    range-bucket prefix sum (the ``pack_chunks``/``shuffle_shards``
    two-pass — NEG_RANK_BUCKETS int64s of driver state); candidates
    attach their part id via ONE rank-keyed ``copartition_attach``; the
    positive-collision drop is one (order, part)-routed anti-join. Ids
    only through every exchange."""
    from ..ops.joins import copartition_attach

    # -- part rank table: rank = ROW_NUMBER() OVER (ORDER BY p_partkey) - 1
    pt = _t(sf_dir, "part", ["p_partkey"])

    def mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty parquet block: degrade, never ValueError
            return pd.DataFrame(
                {"lo": pd.Series([], dtype=np.int64),
                 "hi": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        p = df["p_partkey"].to_numpy(np.int64)
        return pd.DataFrame({"lo": [int(p.min())], "hi": [int(p.max())], "n": [len(p)]})

    mm = pt.map_batches(mm_partial, batch_format="pandas").to_pandas()
    if not len(mm):
        return pd.DataFrame(
            {"l_orderkey": pd.Series([], dtype=np.int64),
             "pos_part": pd.Series([], dtype=np.int64),
             "j": pd.Series([], dtype=np.int64),
             "neg_part": pd.Series([], dtype=np.int64)}
        )
    lo, hi, n_parts = int(mm["lo"].min()), int(mm["hi"].max()), int(mm["n"].sum())
    width = (hi - lo) // NEG_RANK_BUCKETS + 1

    def bucket_of(df: pd.DataFrame) -> pd.DataFrame:
        p = df["p_partkey"].to_numpy(np.int64)
        return pd.DataFrame({"p_partkey": p, "bucket": (p - lo) // width})

    keyed = pt.map_batches(bucket_of, batch_format="pandas").materialize()
    cnt = keyed.map_batches(
        lambda df: df.groupby("bucket", sort=False).size().reset_index(name="n"),
        batch_format="pandas",
    ).to_pandas()
    counts = np.zeros(NEG_RANK_BUCKETS + 1, np.int64)
    np.add.at(counts, cnt["bucket"].to_numpy(np.int64), cnt["n"].to_numpy(np.int64))
    base = np.zeros(NEG_RANK_BUCKETS + 1, np.int64)
    base[1:] = np.cumsum(counts[:-1])

    def rank_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "p_partkey"], kind="mergesort")
        b = g["bucket"].to_numpy(np.int64)
        idx = np.arange(len(g), dtype=np.int64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = b[1:] != b[:-1]
        first = idx[np.maximum.accumulate(np.where(new, idx, 0))]
        return pd.DataFrame(
            {"r": base[b] + (idx - first),
             "p_partkey": g["p_partkey"].to_numpy(np.int64)}
        )

    ranks = (
        keyed.map_batches(lambda df: _route(df, "bucket"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(rank_rows, batch_format="pandas")
    )

    # -- positives + hash-proposed candidates
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pos_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _route(
            df.drop_duplicates().rename(
                columns={"l_orderkey": "o", "l_partkey": "p"}
            ),
            "o",
        )

    pos = (
        li.map_batches(pos_rows, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g[["o", "p"]].drop_duplicates(), batch_format="pandas"
        )
    ).materialize()

    def propose(df: pd.DataFrame) -> pd.DataFrame:
        o = np.repeat(df["o"].to_numpy(np.uint64), NEG_K)
        p = np.repeat(df["p"].to_numpy(np.uint64), NEG_K)
        j = np.tile(np.arange(1, NEG_K + 1, dtype=np.uint64), len(df))
        m32 = np.uint64(_SHUFFLE_MOD)
        b0 = (o * np.uint64(31) + p + j * np.uint64(97)) % m32
        r = ((b0 * np.uint64(_SHUFFLE_MULT)) % m32) % np.uint64(n_parts)
        return pd.DataFrame(
            {"o": o.astype(np.int64), "p": p.astype(np.int64),
             "j": j.astype(np.int64), "r": r.astype(np.int64)}
        )

    cand = pos.map_batches(propose, batch_format="pandas")
    with_part = copartition_attach(
        cand, ranks, "r", "r", {"p_partkey": "neg_part"}
    )

    # -- drop proposals colliding with a true positive of the same order
    def mark_cand(df: pd.DataFrame) -> pd.DataFrame:
        # copartition_attach can emit float64 neg_part on empty merge
        # groups — cast EVERYTHING to int64 so the _k routing hash sees
        # identical bits on both union sides
        out = pd.DataFrame(
            {"o": df["o"].to_numpy(np.int64), "p": df["p"].to_numpy(np.int64),
             "j": df["j"].to_numpy(np.int64),
             "neg_part": df["neg_part"].to_numpy(np.int64)}
        )
        out["kind"] = np.int8(0)
        return _route(
            out.assign(_k=out["o"] * np.int64(1_000_003) + out["neg_part"]), "_k"
        ).drop(columns=["_k"])

    def mark_pos(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"o": df["o"].to_numpy(np.int64), "p": np.int64(-1),
             "j": np.int64(-1), "neg_part": df["p"].to_numpy(np.int64)}
        )
        out["kind"] = np.int8(1)
        return _route(
            out.assign(_k=out["o"] * np.int64(1_000_003) + out["neg_part"]), "_k"
        ).drop(columns=["_k"])

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 0]
        t = g[g["kind"] == 1][["o", "neg_part"]].drop_duplicates()
        m = c.merge(t, on=["o", "neg_part"], how="left", indicator=True)
        m = m[m["_merge"] == "left_only"]
        return pd.DataFrame(
            {"l_orderkey": m["o"].to_numpy(np.int64),
             "pos_part": m["p"].to_numpy(np.int64),
             "j": m["j"].to_numpy(np.int64),
             "neg_part": m["neg_part"].to_numpy(np.int64)}
        )

    return (
        with_part.map_batches(mark_cand, batch_format="pandas")
        .union(pos.map_batches(mark_pos, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(anti, batch_format="pandas")
    )


SQL_NEGATIVE_SAMPLES = f"""
WITH pos AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (
  SELECT p_partkey, ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS r FROM part),
n AS (SELECT COUNT(*) AS c FROM part),
cand AS (
  SELECT o, p, gs.j AS j,
         CAST((((CAST(((o * 31 + p + gs.j * 97) % {_SHUFFLE_MOD}) AS HUGEINT)
                 * {_SHUFFLE_MULT}) % {_SHUFFLE_MOD})
               % (SELECT c FROM n)) AS BIGINT) AS r
  FROM pos, (SELECT unnest(generate_series(1, {NEG_K})) AS j) gs)
SELECT c.o AS l_orderkey, c.p AS pos_part, CAST(c.j AS BIGINT) AS j,
       pr.p_partkey AS neg_part
FROM cand c JOIN pr USING (r)
LEFT JOIN pos x ON x.o = c.o AND x.p = pr.p_partkey
WHERE x.o IS NULL
"""


QUERIES_EXPORT = {
    "shuffle_shards_docs": q_shuffle_shards_docs,
    "fuzzy_contamination": q_fuzzy_contamination,
    "span_removed_docs": q_span_removed_docs,
    "block_dedup_docs": q_block_dedup_docs,
    "pii_redact_docs": q_pii_redact_docs,
    "negative_samples": q_negative_samples,
}

ORACLE_SQL_EXPORT = {
    "shuffle_shards_docs": SQL_SHUFFLE_SHARDS,
    "fuzzy_contamination": SQL_FUZZY_CONTAMINATION,
    "span_removed_docs": SQL_SPAN_REMOVED,
    "block_dedup_docs": SQL_BLOCK_DEDUP,
    "pii_redact_docs": SQL_PII_REDACT,
    "negative_samples": SQL_NEGATIVE_SAMPLES,
}

# self-register into the main battery (same contract as analytics_ext)
from .analytics import ORACLE_SQL as _MAIN_SQL  # noqa: E402
from .analytics import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUERIES_EXPORT)
_MAIN_SQL.update(ORACLE_SQL_EXPORT)
