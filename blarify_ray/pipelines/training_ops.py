"""Training-data-pipeline queries over the testdata tables — the
large-scale-pipeline operator families (dedup, similarity search, text
analysis) exposed through the driver contract. Non-SQL-expressible
(sketches, LSH, ANN, heuristics) → no oracle entry; the driver records
rows-only checks and `tests/test_ops.py` provides planted-ground-truth
verification.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from ..ops.dedup import minhash_near_dup, simhash_docs, simhash_near_dup
from ..ops.similarity import IvfIndex, PqCodebook, embedding_near_dup
from ..ops.text_analysis import fingerprints, lang_id, quality_score


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])


def q_minhash_dedup_docs(sf_dir: str):
    return minhash_near_dup(_docs(sf_dir), "text", "doc_id")


def q_simhash_docs(sf_dir: str):
    return simhash_docs(_docs(sf_dir), "text", "doc_id")


def q_simhash_pairs_docs(sf_dir: str):
    return simhash_near_dup(_docs(sf_dir), "text", "doc_id", max_hamming=6)


def q_lang_id_docs(sf_dir: str):
    return lang_id(_docs(sf_dir), "text", "doc_id")


def q_quality_docs(sf_dir: str):
    return quality_score(_docs(sf_dir), "text", "doc_id")


def q_compression_docs(sf_dir: str):
    """MassiveText/Gopher zlib-ratio repetitiveness signal (map-only)."""
    from ..ops.text_analysis import compression_ratio

    return compression_ratio(_docs(sf_dir), "text", "doc_id")


def q_ccnet_buckets(sf_dir: str):
    """The CCNet head/middle/tail split: score every doc's bits-per-byte
    under the corpus trigram LM, estimate the tercile cutoffs with the
    deterministic KLL sketch (blob-scale exchange, scores never leave
    workers), and label each doc by comparing to the cutoffs — so the
    ordering contract (every head bpb <= t1 < every tail's assignment
    threshold) holds EXACTLY even though the cutoffs are approximate.
    Returns (doc_id, bits_per_byte, bucket) with bucket in
    {head, middle, tail}; head = most fluent (lowest bpb)."""
    from ..ops.sketches import approx_quantiles
    from ..ops.text_analysis import lm_perplexity, train_byte_trigram_lm

    docs = _docs(sf_dir)
    lm = train_byte_trigram_lm(docs, "text")
    scored = lm_perplexity(docs, lm, "text", "doc_id").materialize()
    cuts = approx_quantiles(scored, "bits_per_byte", [1 / 3, 2 / 3])
    t1, t2 = float(cuts[1 / 3]), float(cuts[2 / 3])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        bpb = df["bits_per_byte"].to_numpy(np.float64)
        bucket = np.where(bpb <= t1, "head", np.where(bpb <= t2, "middle", "tail"))
        return pd.DataFrame(
            {
                "doc_id": df["id"].to_numpy(np.int64),
                "bits_per_byte": bpb,
                "bucket": pd.Series(bucket, dtype=str),
            }
        )

    return scored.map_batches(bucketize, batch_format="pandas")


def q_fingerprints_docs(sf_dir: str):
    return fingerprints(_docs(sf_dir), "text", "doc_id").select_columns(["id", "n_fingerprints"])


def q_vector_topk_ivf(sf_dir: str):
    """ANN over the embeddings table through the PERSISTED IVF layout:
    train → hive-partitioned inverted-list write (zero-shuffle) → a
    search that reads only the ``nprobe`` centroid dirs — the
    touch-a-fraction scale path, not a filtered full scan."""
    import shutil
    import tempfile

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    qtbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    qvec = None
    for vid, v in zip(qtbl["vec_id"].to_pylist(), qtbl["embedding"].to_pylist()):
        if vid == 0:
            qvec = np.asarray(v, dtype=np.float64)
            break
    idx = IvfIndex.train(emb, n_centroids=16)
    layout = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
    try:
        idx.write_partitioned(emb, layout)
        hits = idx.search_partitioned(layout, qvec, k=10, nprobe=6)
    finally:
        shutil.rmtree(layout, ignore_errors=True)
    import pandas as pd

    return pd.DataFrame({"vec_id": [i for i, _ in hits], "rank": list(range(1, len(hits) + 1))})


def q_embedding_near_dup(sf_dir: str):
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    return embedding_near_dup(emb, threshold=0.5)


def q_vector_topk_pq(sf_dir: str):
    """ANN through product quantization: train per-subspace codebooks,
    encode the corpus to m uint8 codes/vector (the only corpus-scale
    search artifact), ADC top-k for vec 0's own vector. The memory-
    bound ANN path: raw vectors are scanned once at encode time."""
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    qtbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    qvec = None
    dim = 0
    for vid, v in zip(qtbl["vec_id"].to_pylist(), qtbl["embedding"].to_pylist()):
        dim = len(v)
        if vid == 0:
            qvec = np.asarray(v, dtype=np.float64)
            break
    m = next(m for m in (8, 4, 2, 1) if dim % m == 0)
    book = PqCodebook.train(emb, m=m)
    codes = book.encode(emb).materialize()  # m B/vector
    hits = book.search(codes, qvec, k=10)
    import pandas as pd

    return pd.DataFrame({"vec_id": [i for i, _ in hits], "rank": list(range(1, len(hits) + 1))})


def q_media_features(sf_dir: str):
    """Multimodal plumbing: synthetic media table → actor-pool decode
    (codec stubbed deterministically) → typed metadata rows."""
    from ..ops.multimodal import decode_media, synth_media_table
    from ..sources.pages import pages_count_for_sf

    n = max(30, pages_count_for_sf(sf_dir) // 10)
    media = rd.from_arrow(synth_media_table(n))
    return decode_media(media).select_columns(["media_id", "kind", "width", "height"])


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate COUNT(DISTINCT user_id) — mergeable-sketch
    metrics pattern (deterministic hashing → stable estimate)."""
    import pandas as pd

    from ..ops.sketches import approx_distinct

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    est = approx_distinct(ev, "user_id")
    return pd.DataFrame({"n_users_approx": [int(round(est))]})


def q_approx_distinct_users_by_type(sf_dir: str):
    """Grouped HLL: approximate COUNT(DISTINCT user_id) PER event_type —
    the per-key form of the sketch metrics pattern (one register blob
    per (batch, key); key-routed blob exchange; values never move).
    Accuracy vs the exact grouped distinct is pytest-checked."""
    from ..ops.sketches import grouped_distinct

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    return grouped_distinct(ev, "event_type", "user_id")


def q_lm_perplexity_docs(sf_dir: str):
    """CCNet-style LM quality filter: train a byte-trigram LM on the
    corpus (one distributed count pass, vocab-scale exchange), broadcast
    it, score every doc's bits-per-byte in a second map-only pass."""
    from ..ops.text_analysis import lm_perplexity, train_byte_trigram_lm

    docs = _docs(sf_dir)
    lm = train_byte_trigram_lm(docs, "text")
    return lm_perplexity(docs, lm, "text", "doc_id")


# Size tier for the composed cleaning pipeline: below this many
# exact-dedup survivors the keep-set composes on the driver (id-scale
# Python sets, one ray.put broadcast); above it everything composes as
# co-partitioned semi-/anti-joins — NO id universe ever materializes on
# the driver (at 10^12 docs the survivor set IS corpus cardinality).
# Both tiers produce identical rows (forced-tier tested).
CLEAN_CORPUS_BROADCAST_MAX = 5_000_000


def q_clean_corpus_docs(sf_dir: str):
    """The composed training-data CLEANING pipeline — the capstone that
    chains the op families end-to-end the way a real corpus run would:

      exact dedup → MinHash near-dup removal → language filter (en) →
      quality floor → benchmark decontamination

    Each op keeps its own scale shape (hash exchanges, ids-only LSH,
    broadcast snippet scan); the composition communicates by doc-id
    tables — broadcast ``pc.is_in`` filters under
    ``CLEAN_CORPUS_BROADCAST_MAX`` survivors, co-partitioned
    semi-/anti-joins above (the drop sides are key-unique id tables, so
    each composition step is one ``copartition_attach`` marker pass).
    Returns the surviving (doc_id, lang_pred, quality) rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..ops.dedup import exact_dedup, minhash_near_dup
    from ..ops.joins import copartition_attach
    from ..ops.text_analysis import contamination

    # each stage re-reads the pruned parquet scan — at corpus scale a
    # materialize() here would pin the whole text column in the object
    # store; re-scanning is the streaming-friendly choice
    docs = _docs(sf_dir)

    # id-scale; materialized because it is consumed twice (the tier count
    # + the keep-set composition) — recomputing would re-run the corpus
    # md5 pass; id blocks spill fine at scale
    kept_ids = exact_dedup(docs, "text", "doc_id").select_columns(["doc_id"]).materialize()
    near = minhash_near_dup(docs, "text", "doc_id")  # (id, dup_of) drop rows

    # decontamination: the same deterministic benchmark set as the
    # oracle-checked benchmark_contamination query
    from .analytics_ext import CONTAM_MOD, CONTAM_WORDS

    def snippet_partial(df):
        import pandas as pd

        sel = df[df["doc_id"] % CONTAM_MOD == 0]
        sn = sel["text"].str.split(" ").str[:CONTAM_WORDS].str.join(" ")
        return pd.DataFrame({"snippet": sn.astype(str)})

    snippets = [
        r["snippet"]
        for r in docs.map_batches(snippet_partial, batch_format="pandas").take_all()
    ]
    # contaminated docs are dropped UNLESS they are the benchmark donors
    def nondonor(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks(), dtype=np.int64)
        return t.filter(pa.array(ids % CONTAM_MOD != 0)).select(["doc_id"])

    contam_drop = contamination(docs, "text", "doc_id", snippets).map_batches(
        nondonor, batch_format="pyarrow"
    )

    if kept_ids.count() <= CLEAN_CORPUS_BROADCAST_MAX:
        # broadcast tier: id-scale driver sets, ONE ray.put (a closure
        # capture would re-ship the set with every task)
        survivors = {r["doc_id"] for r in kept_ids.take_all()}
        survivors -= {r["id"] for r in near.take_all()}
        survivors -= {r["doc_id"] for r in contam_drop.take_all()}
        keep_ref = ray.put(pa.array(sorted(survivors), pa.int64()))

        def bcast_prune(t: pa.Table) -> pa.Table:
            from ..util import get_broadcast

            return t.filter(
                pc.is_in(t["doc_id"], value_set=get_broadcast(keep_ref))
            )

        pruned = docs.map_batches(bcast_prune, batch_format="pyarrow")
    else:
        # distributed tier: two anti-join marker passes over the id-only
        # survivor table, then one semi-join to pull the surviving docs —
        # the drop tables and the survivor table are all key-unique, and
        # no id set ever lands on the driver
        near_ids = near.map_batches(
            lambda t: pa.Table.from_pydict(
                {"doc_id": t["id"], "_m": pa.array(np.ones(t.num_rows, np.int8))}
            ),
            batch_format="pyarrow",
        )
        drop_ids = contam_drop.map_batches(
            lambda t: t.append_column("_m", pa.array(np.ones(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        surv = kept_ids
        for drops in (near_ids, drop_ids):
            surv = copartition_attach(
                surv, drops, "doc_id", "doc_id", {"_m": "_m"}, how="left"
            ).map_batches(
                lambda t: t.filter(pc.is_null(t["_m"])).select(["doc_id"]),
                batch_format="pyarrow",
            )
        surv = surv.map_batches(
            lambda t: t.append_column("_keep", pa.array(np.ones(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        pruned = copartition_attach(
            docs, surv, "doc_id", "doc_id", {"_keep": "_keep"}, how="inner"
        ).map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        )

    def label_filter(t: pa.Table) -> pa.Table:
        from ..ops.text_analysis import lang_id_text, quality_features

        texts = t["text"].to_pylist()
        langs = [lang_id_text(x)[0] for x in texts]
        quals = [quality_features(x)["quality"] for x in texts]
        out = pa.Table.from_pydict(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang_pred": pa.array(langs, pa.string()),
                "quality": pa.array(quals, pa.float64()),
            }
        )
        return out.filter(
            pc.and_(
                pc.is_in(out["lang_pred"], value_set=pa.array(["en", "und"])),
                pc.greater_equal(out["quality"], 0.25),
            )
        )

    return pruned.map_batches(label_filter, batch_format="pyarrow")


def q_bloom_prefilter_docs(sf_dir: str):
    """Bloom pre-filter for decontamination: build a distributed Bloom
    filter over the benchmark-side texts (every FUZZY_MOD-th doc — the
    same donor rule as ``fuzzy_contamination``), probe the WHOLE corpus
    map-only, return the flagged (doc_id, maybe_member) rows. No false
    negatives by construction — every true benchmark text flags — so
    the exact (expensive) containment check downstream only runs on the
    flagged sliver. Deterministic (md5 double hashing): rows-only driver
    check + bit-level invariants in tests/test_ops.py.

    Scale shape: build = one bit-blob partial per batch, OR-fold
    (driver state = the filter, constant in corpus size); probe =
    map-only against the broadcast filter."""
    from ..ops.sketches import bloom_build, bloom_probe
    from .analytics_export import FUZZY_MOD

    docs = _docs(sf_dir)

    def bench_side(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % FUZZY_MOD == 0]
        return pd.DataFrame({"text": d["text"].fillna("")})

    bloom = bloom_build(
        docs.map_batches(bench_side, batch_format="pandas"), "text",
        n_bits=1 << 18, k=7,
    )
    flagged = bloom_probe(docs, "text", bloom)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["maybe_member"]]
        return pd.DataFrame({"doc_id": d["doc_id"].to_numpy(np.int64)})

    return flagged.map_batches(keep, batch_format="pandas")


def q_source_length_quantiles(sf_dir: str):
    """Per-source p50/p90 document length via GROUPED KLL sketches —
    key-scale blob rows through one key-routed exchange; the raw length
    column never shuffles. Accuracy pytest-verified per group."""
    from ..ops.sketches import grouped_quantiles

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "n_chars"]
    )
    return grouped_quantiles(docs, "source", "n_chars", [0.5, 0.9])


def q_heavy_words_docs(sf_dir: str):
    """Misra-Gries heavy-hitter words — the shuffle-FREE approximate
    sibling of the exact (oracle-checked) word_topk: one summary blob
    per batch, merged on the driver with deterministic error bounds.
    Verified against the exact counts in pytest (test_ops)."""
    import pandas as pd

    from ..ops.sketches import heavy_hitter_words

    top = heavy_hitter_words(_docs(sf_dir), "text", n=25)
    return pd.DataFrame(
        {
            "word": [w for w, _, _ in top],
            "count_lo": np.array([lo for _, lo, _ in top], np.int64),
            "count_hi": np.array([hi for _, _, hi in top], np.int64),
        }
    )


def q_bpe_token_counts(sf_dir: str):
    """Tokenizer-construction + counting: train a BPE vocab on the corpus
    (distributed wordcount → driver merge learning on the vocab-scale
    table, the Sennrich decomposition), broadcast the merge ranks, and
    count tokens per document in one map pass (per-DISTINCT-word
    encoding, factorized gather)."""
    from ..ops.bpe import bpe_encode, train_bpe

    docs = _docs(sf_dir)
    merges = train_bpe(docs, "text", n_merges=128)
    return bpe_encode(docs, merges, "text", "doc_id")


def q_doc_length_quantiles(sf_dir: str):
    """KLL quantile-sketch metrics: approximate p50/p90/p99 of document
    length — blob-scale shuffle (one ~KiB sketch per batch), the raw
    column never leaves the workers. Deterministic compaction → the same
    estimate on every run (rows-only driver check is stable); accuracy
    vs exact quantiles is pytest-verified (test_ops)."""
    import pandas as pd

    from ..ops.sketches import approx_quantiles

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"])
    est = approx_quantiles(docs, "n_chars", [0.5, 0.9, 0.99])
    return pd.DataFrame(
        {
            "p50_chars": [est[0.5]],
            "p90_chars": [est[0.9]],
            "p99_chars": [est[0.99]],
        }
    )




def q_knn_graph_ivf(sf_dir: str):
    """Approximate k-NN graph via IVF bucketing — the no-broadcast
    100-TB path (see ``ops/similarity.knn_graph_ivf``): each vector
    moves 1+nprobe times through ONE cell-keyed exchange, each cell
    runs a local matmul, a k-scale query-keyed exchange merges. Recall
    vs the exact graph is pytest-checked (no SQL oracle — approximate
    by design)."""
    from ..ops.similarity import knn_graph_ivf

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return knn_graph_ivf(emb, k=5, n_centroids=16, nprobe=6).select_columns(
        ["vec_id", "nn_id", "rank"]
    )

def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic dedup over the embeddings table (see
    ``ops/similarity.semdedup``): k-means clusters + within-cluster
    cosine; dropped rows returned as (vec_id, dup_of, cos). Planted-
    ground-truth pytest verification (no SQL oracle — iterative k-means
    is not SQL-expressible)."""
    from ..ops.similarity import semdedup

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # the synthetic embeddings carry no true dups (max pairwise cos
    # ≈ 0.51 at sf0.01) — 0.45 exercises the drop path deterministically,
    # same calibration as q_embedding_near_dup's 0.5
    return semdedup(emb, threshold=0.45, n_clusters=16)


def q_quality_classifier_docs(sf_dir: str):
    """Seed-labeled quality classifier (the CCNet/GPT-3 reference-corpus
    scorer): label = the doc mentions the seed token, train the hashed
    BoW logistic regression distributed (one dim-float gradient exchange
    per epoch, model-scale driver state), score the corpus map-only.
    Returns (doc_id, prob, label) — the learned scores must land the
    labeled docs above 0.5 (asserted by test_classifier's planted-truth
    runs; here the driver checks rows/schema)."""
    import os as _os

    import ray.data as _rd

    from ..ops.classifier import score_logreg, train_logreg

    docs = _rd.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def label(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "text": s,
                "label": s.str.split().map(lambda ts: int("spark" in ts)).astype(np.int64),
            }
        )

    labeled = docs.map_batches(label, batch_format="pandas").materialize()
    w, _losses = train_logreg(labeled, "text", "label", dim=1 << 14, epochs=100, lr=12.0)
    scored = score_logreg(labeled, w, "text", "doc_id", keep_cols=["label"])
    return scored.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["id"].to_numpy(np.int64),
                "prob": df["prob"].to_numpy(np.float64),
                "label": df["label"].to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
    )


QUERIES = {
    "media_features": q_media_features,
    "quality_classifier_docs": q_quality_classifier_docs,
    "approx_distinct_users": q_approx_distinct_users,
    "approx_distinct_users_by_type": q_approx_distinct_users_by_type,
    "minhash_dedup_docs": q_minhash_dedup_docs,
    "simhash_docs": q_simhash_docs,
    "simhash_pairs_docs": q_simhash_pairs_docs,
    "lang_id_docs": q_lang_id_docs,
    "quality_docs": q_quality_docs,
    "compression_docs": q_compression_docs,
    "ccnet_buckets": q_ccnet_buckets,
    "fingerprints_docs": q_fingerprints_docs,
    "vector_topk_ivf": q_vector_topk_ivf,
    "vector_topk_pq": q_vector_topk_pq,
    "knn_graph_ivf": q_knn_graph_ivf,
    "embedding_near_dup": q_embedding_near_dup,
    "doc_length_quantiles": q_doc_length_quantiles,
    "lm_perplexity_docs": q_lm_perplexity_docs,
    "bpe_token_counts": q_bpe_token_counts,
    "heavy_words_docs": q_heavy_words_docs,
    "clean_corpus_docs": q_clean_corpus_docs,
    "source_length_quantiles": q_source_length_quantiles,
    "semdedup_embeddings": q_semdedup_embeddings,
    "bloom_prefilter_docs": q_bloom_prefilter_docs,
}
