"""Training-data ops: dedup family, similarity search, text analysis,
multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from blarify_ray.ops.dedup import exact_dedup, minhash_near_dup, simhash_near_dup
from blarify_ray.ops.multimodal import (
    FEATURE_DIM,
    MediaDecoder,
    decode_media,
    frame_sample,
    synth_media_table,
)
from blarify_ray.ops.similarity import IvfIndex, embedding_near_dup, knn_bruteforce
from blarify_ray.ops.text_analysis import (
    fingerprint_text,
    lang_id_text,
    quality_features,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind the green hills and the river runs quietly to the sea"
)
NEAR = BASE.replace("quietly", "silently")  # one-word change → near-dup
OTHER = (
    "completely different content about spacecraft engines and orbital "
    "mechanics with no overlap whatsoever in the token stream at all"
)


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [BASE, NEAR, OTHER, BASE],  # 4 = exact dup of 1
            }
        )
    )


def test_exact_dedup():
    out = exact_dedup(_docs(), "text", "doc_id").take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 2, 3]  # doc 4 collapsed into 1


def test_minhash_near_dup():
    pairs = minhash_near_dup(_docs(), "text", "doc_id").take_all()
    dup = {(r["id"], r["dup_of"]) for r in pairs}
    assert (2, 1) in dup and (4, 1) in dup
    assert all(r["id"] != 3 and r["dup_of"] != 3 for r in pairs)


def test_minhash_band_rows_carry_ids_only():
    """Scale invariant: the LSH banding shuffle must move (pkey, band,
    id) rows ONLY — never the document text or the signature."""
    from blarify_ray.config import DEFAULT_CONFIG
    from blarify_ray.minhash import make_perms
    from blarify_ray.ops.dedup import minhash_band_rows

    perms = make_perms(DEFAULT_CONFIG.minhash_perms, seed="blarify-ray:docdedup")
    bands = minhash_band_rows(_docs(), "text", "doc_id", DEFAULT_CONFIG, 3, perms)
    assert set(bands.schema().names) == {"pkey", "band_id", "band_hash", "id"}


def test_minhash_band_rows_bit_identical_to_scalar():
    """The vectorized batch banding must reproduce the scalar
    minhash_signature/band_hashes loop byte-for-byte (incl. the empty-doc
    all-max sentinel and the doc-major band-row order)."""
    from blarify_ray.config import DEFAULT_CONFIG as CFG
    from blarify_ray.minhash import band_hashes, make_perms, minhash_signature
    from blarify_ray.ops.dedup import _word_shingles, minhash_band_rows

    docs = [(1, BASE), (2, NEAR), (3, ""), (4, "one two"), (5, BASE)]
    perms = make_perms(CFG.minhash_perms, seed="blarify-ray:docdedup")
    want = []
    for i, text in docs:
        sig = minhash_signature(_word_shingles(text, 3), *perms)
        for band_id, bh in enumerate(band_hashes(sig, CFG.lsh_bands)):
            want.append((bh % CFG.agg_partitions, band_id, bh, i))
    ds = rd.from_arrow(
        pa.table({"doc_id": [i for i, _ in docs], "text": [t for _, t in docs]})
    )
    got = [
        (r["pkey"], r["band_id"], r["band_hash"], r["id"])
        for r in minhash_band_rows(ds, "text", "doc_id", CFG, 3, perms).take_all()
    ]
    assert got == want


def test_simhash_near_dup():
    pairs = simhash_near_dup(_docs(), "text", "doc_id", max_hamming=6).take_all()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (1, 4) in got  # exact dup → hamming 0
    assert (1, 2) in got or (2, 4) in got  # near dup within 6 bits
    assert not any(3 in p for p in got)


def _emb_ds(n=50, d=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d).astype(np.float32)
    m[7] = m[0] + 0.01 * rng.randn(d)  # planted near-duplicate of vec 0
    return rd.from_arrow(
        pa.table({"vec_id": list(range(n)), "embedding": [list(map(float, r)) for r in m]})
    ), m


def test_knn_bruteforce_exact():
    ds, m = _emb_ds()
    got = knn_bruteforce(ds, m[0], k=5)[0]
    mm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mm @ (m[0] / np.linalg.norm(m[0]))
    want = sorted(range(len(m)), key=lambda i: (-sims[i], i))[:5]
    assert [i for i, _ in got] == want


def test_ivf_recall():
    ds, m = _emb_ds(n=200)
    idx = IvfIndex.train(ds, n_centroids=8)
    assigned = idx.assign(ds).materialize()
    exact = {i for i, _ in knn_bruteforce(ds, m[0], k=10)[0]}
    approx = {i for i, _ in idx.search(assigned, m[0], k=10, nprobe=4)}
    assert len(exact & approx) / 10 >= 0.8


def test_ivf_partitioned_layout_prunes_and_matches(tmp_path):
    """The persisted centroid-partitioned layout must (a) read ONLY the
    nprobe partition dirs, (b) return the exact rows the in-memory probe
    filter returns, (c) keep recall ≥ 0.8 vs brute force."""
    import os

    ds, m = _emb_ds(n=200)
    idx = IvfIndex.train(ds, n_centroids=8)
    layout = idx.write_partitioned(ds, str(tmp_path / "ivf"))
    all_dirs = {d for d in os.listdir(layout) if d.startswith("centroid=")}
    assert len(all_dirs) > 4  # the layout is genuinely split
    dirs = idx.probe_dirs(layout, m[0], nprobe=4)
    assert 0 < len(dirs) <= 4  # a probe touches only nprobe dirs
    assert {os.path.basename(d) for d in dirs} <= all_dirs
    got = idx.search_partitioned(layout, m[0], k=10, nprobe=4)
    assigned = idx.assign(ds).materialize()
    want = idx.search(assigned, m[0], k=10, nprobe=4)
    assert [(i, round(s, 9)) for i, s in got] == [(i, round(s, 9)) for i, s in want]
    exact = {i for i, _ in knn_bruteforce(ds, m[0], k=10)[0]}
    assert len(exact & {i for i, _ in got}) / 10 >= 0.8


def test_embedding_near_dup():
    ds, _ = _emb_ds()
    pairs = embedding_near_dup(ds, threshold=0.95).take_all()
    assert any({r["a"], r["b"]} == {0, 7} for r in pairs)


def test_pq_adc_recall():
    """PQ encode → ADC search: codes are m uint8/vector, the planted
    near-duplicate of the query lands in the top ranks, recall@10 vs
    brute force clears the ANN bar."""
    from blarify_ray.ops.similarity import PqCodebook

    ds, m = _emb_ds(n=200, d=16)
    book = PqCodebook.train(ds, m=4)
    codes = book.encode(ds).materialize()
    row = codes.take(1)[0]
    assert len(row["code"]) == 4  # 16 floats → 4 bytes
    got = book.search(codes, m[0], k=10)
    ids = [i for i, _ in got]
    assert 7 in ids[:3]  # the planted near-dup of vec 0 scores near the top
    assert 0 in ids[:3]  # the query itself too
    exact = {i for i, _ in knn_bruteforce(ds, m[0], k=10)[0]}
    assert len(exact & set(ids)) / 10 >= 0.6


def test_ivfpq_layout_prunes_and_recalls(tmp_path):
    """IVF-PQ: one fused assign+encode pass, hive split by centroid,
    probed ADC search touches only nprobe dirs and keeps recall."""
    import os

    from blarify_ray.ops.similarity import PqCodebook, search_ivfpq, write_ivfpq

    ds, m = _emb_ds(n=200, d=16)
    ivf = IvfIndex.train(ds, n_centroids=8)
    book = PqCodebook.train(ds, m=4)
    layout = write_ivfpq(ivf, book, ds, str(tmp_path / "ivfpq"))
    all_dirs = {d for d in os.listdir(layout) if d.startswith("centroid=")}
    assert len(all_dirs) > 4  # genuinely split
    got = search_ivfpq(ivf, book, layout, m[0], k=10, nprobe=4)
    ids = [i for i, _ in got]
    assert 0 in ids[:3] and 7 in ids  # query + planted near-dup retrieved
    exact = {i for i, _ in knn_bruteforce(ds, m[0], k=10)[0]}
    assert len(exact & set(ids)) / 10 >= 0.5  # both prunes compound
    # refine: exact re-scoring of the ADC shortlist — every exact
    # neighbor living in a probed cell must now surface, with TRUE
    # cosine scores (rank-1 = the query itself at cos ≈ 1)
    ref = search_ivfpq(ivf, book, layout, m[0], k=10, nprobe=8, rerank=50)
    rids = [i for i, _ in ref]
    assert rids[0] == 0 and abs(ref[0][1] - 1.0) < 1e-9
    assert len(exact & set(rids)) / 10 >= 0.8


def test_pq_dim_not_divisible_raises():
    from blarify_ray.ops.similarity import PqCodebook

    ds, _ = _emb_ds(n=30, d=10)
    with pytest.raises(ValueError):
        PqCodebook.train(ds, m=4)


def test_lang_id_heuristic():
    assert lang_id_text("the cat sat on the mat and it was happy with this")[0] == "en"
    assert lang_id_text("der Hund und die Katze sind in dem Haus mit einem Ball")[0] == "de"
    assert lang_id_text("le chat est dans la maison avec le chien et il est content")[0] == "fr"
    assert lang_id_text("这是一个中文测试文本，用来检测语言识别功能是否正常工作")[0] == "zh"
    assert lang_id_text("")[0] == "und"
    assert lang_id_text("zzz qqq vvv xxx www")[0] == "und"


def test_quality_features():
    good = quality_features(BASE)
    junk = quality_features("@@## $$%% ^^&& ** (( )) !!!! ???? ;;;; 0101 ####")
    assert good["quality"] > junk["quality"]
    assert quality_features("")["quality"] == 0.0


def test_fingerprints_overlap_for_near_dups():
    a, b, c = set(fingerprint_text(BASE)), set(fingerprint_text(NEAR)), set(fingerprint_text(OTHER))
    assert len(a & b) / len(a | b) > 0.5
    assert len(a & c) == 0


import pytest as _pytest

from blarify_ray.ops.multimodal import _HAVE_PIL


@_pytest.mark.parametrize(
    "codec",
    [
        "stub",
        _pytest.param(
            "real",
            marks=_pytest.mark.skipif(not _HAVE_PIL, reason="PIL not installed"),
        ),
    ],
)
def test_media_decode_plumbing(codec):
    """Both codec paths share the exact same Ray plumbing contract:
    schema, FEATURE_DIM features, deterministic output, graceful
    sentinel on malformed payloads. The real path runs only when PIL is
    importable; on SYNM synthetic payloads it falls back per-item to the
    stub parser, so assertions are codec-independent."""
    media = rd.from_arrow(synth_media_table(30))
    out = decode_media(media, codec=codec).take_all()
    assert len(out) == 30
    r = out[0]
    assert len(r["features"]) == FEATURE_DIM
    assert r["width"] > 0 and r["height"] > 0
    # deterministic across calls
    out2 = decode_media(rd.from_arrow(synth_media_table(30)), codec=codec).take_all()
    assert [x["features"][0] for x in out] == [x["features"][0] for x in out2]
    # malformed payload → graceful sentinel, not a crash
    bad = MediaDecoder(codec=codec)(pa.table(
        {"media_id": [99], "kind": ["image"], "mime": ["x"], "payload": [b"\x00\x01"]}
    ))
    assert bad["width"][0].as_py() == -1


def test_media_decoder_codec_selection():
    """codec='real' without PIL raises ImportError (not a silent stub);
    'auto' resolves to the stub in this container; unknown codec raises."""
    if not _HAVE_PIL:
        with _pytest.raises(ImportError):
            MediaDecoder(codec="real")
    auto = MediaDecoder(codec="auto")
    assert auto._decode == auto._decode_stub or _HAVE_PIL
    with _pytest.raises(ValueError):
        MediaDecoder(codec="webp")


def test_frame_sample():
    media = rd.from_arrow(synth_media_table(9))
    frames = frame_sample(media, every_n=2).take_all()
    assert frames and all(f["frame_idx"] % 2 == 0 for f in frames)
    vids = {f["media_id"] for f in frames}
    assert all(mid % 3 == 2 for mid in vids)  # only 'video' rows sampled


def test_minhash_forced_distributed_tiers():
    """Above-threshold tiers forced on (candidate ids via co-partitioned
    semi-join instead of driver broadcast; clustering via the distributed
    min-label loop instead of driver union-find) must produce exactly the
    default tiers' output."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG

    forced = dataclasses.replace(
        DEFAULT_CONFIG, dedup_candidate_broadcast_max=0, cc_driver_max_pairs=0
    )
    want = {(r["id"], r["dup_of"]) for r in minhash_near_dup(_docs(), "text", "doc_id").take_all()}
    got = {
        (r["id"], r["dup_of"])
        for r in minhash_near_dup(_docs(), "text", "doc_id", forced).take_all()
    }
    assert got == want
    assert (2, 1) in got and (4, 1) in got


def test_cluster_pairs_min_label_distributed_int64():
    """The distributed clustering fallback must handle int64 ids (the old
    connected_components hardcoded string labels and would ArrowTypeError
    on this path) and agree with the driver union-find tier."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG
    from blarify_ray.ops.dedup import cluster_pairs_min_label

    pairs = rd.from_arrow(pa.table({"a": [2, 3, 10], "b": [1, 2, 11]}))
    want = [(2, 1), (3, 1), (11, 10)]
    forced = dataclasses.replace(DEFAULT_CONFIG, cc_driver_max_pairs=0)
    assert cluster_pairs_min_label(pairs, DEFAULT_CONFIG) == want
    assert cluster_pairs_min_label(pairs, forced) == want


def test_items_for_candidates_tiers_equal():
    """Both prune tiers (broadcast id array / co-partitioned semi-join)
    must select exactly the candidate rows."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG
    from blarify_ray.ops.dedup import items_for_candidates

    cand = rd.from_arrow(pa.table({"a": [1, 4], "b": [2, 1]}))
    for thresh in (10_000, 0):  # broadcast tier, then forced semi-join tier
        cfg = dataclasses.replace(DEFAULT_CONFIG, dedup_candidate_broadcast_max=thresh)
        got = items_for_candidates(_docs(), cand, "doc_id", ["doc_id", "text"], cfg).take_all()
        assert sorted(r["doc_id"] for r in got) == [1, 2, 4]
        assert all(set(r) == {"doc_id", "text"} for r in got)


def test_embedding_near_dup_forced_distributed_tier():
    ds, _ = _emb_ds()
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG

    forced = dataclasses.replace(DEFAULT_CONFIG, dedup_candidate_broadcast_max=0)
    want = {(r["a"], r["b"]) for r in embedding_near_dup(ds, threshold=0.95).take_all()}
    got = {
        (r["a"], r["b"])
        for r in embedding_near_dup(ds, threshold=0.95, cfg=forced).take_all()
    }
    assert got == want and any({a, b} == {0, 7} for a, b in got)


# --- QuantileSketch (KLL-style, deterministic compaction) -------------------


def test_quantile_sketch_accuracy_merge_and_roundtrip():
    from functools import reduce

    from blarify_ray.ops.sketches import QuantileSketch

    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 25.0, 200_000)
    sketches = []
    for chunk in np.array_split(vals, 37):
        s = QuantileSketch(256)
        s.add(chunk)
        sketches.append(s)
    acc = reduce(lambda a, b: a.merge(b), sketches)
    assert acc.total_weight() == len(vals)  # weight-exact compaction
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = acc.quantile(q)
        rank = float(np.mean(vals <= est))
        assert abs(rank - q) < 0.025, (q, est, rank)
    # serialize → deserialize reproduces the sketch exactly
    clone = QuantileSketch.deserialize(acc.serialize())
    assert clone.total_weight() == acc.total_weight()
    assert all(
        np.array_equal(a, b) for a, b in zip(acc.levels, clone.levels)
    )
    # deterministic: same data in the same chunks → identical estimates
    s2 = reduce(
        lambda a, b: a.merge(b),
        [
            (lambda s, c: (s.add(c), s)[1])(QuantileSketch(256), chunk)
            for chunk in np.array_split(vals, 37)
        ],
    )
    assert s2.quantile(0.5) == acc.quantile(0.5)


def test_approx_quantiles_dataset_close_to_exact():
    import pyarrow.parquet as pq

    from blarify_ray.ops.sketches import approx_quantiles

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = rd.read_parquet(path, columns=["n_chars"])
    est = approx_quantiles(ds, "n_chars", [0.5, 0.9])
    exact = np.asarray(pq.read_table(path, columns=["n_chars"])["n_chars"])
    for q, e in est.items():
        rank = float(np.mean(exact <= e))
        assert abs(rank - q) < 0.05, (q, e, rank)


# --- byte-trigram LM perplexity (CCNet-style quality filter) -----------------


def test_lm_perplexity_separates_gibberish():
    from blarify_ray.ops.text_analysis import lm_perplexity, train_byte_trigram_lm

    normal = [
        "the quick brown fox jumps over the lazy dog and the dog sleeps",
        "a data pipeline reads web pages and extracts entities from text",
        "the engine builds a knowledge graph over the page corpus daily",
        "workers stream batches of documents through the extraction stage",
    ] * 30
    gibberish = "qzxjvw kqzpxv jvqzzx wwqkxj zzqvxp kjqwzx"
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(normal)]
    rows.append({"doc_id": 999, "text": gibberish})
    ds = rd.from_items(rows)
    lm = train_byte_trigram_lm(ds, "text")
    scored = {r["id"]: r["bits_per_byte"] for r in lm_perplexity(ds, lm, "text", "doc_id").take_all()}
    normal_mean = np.mean([scored[i] for i in range(len(normal))])
    assert scored[999] > normal_mean + 2.0, (scored[999], normal_mean)
    # deterministic: retrain + rescore gives identical floats
    lm2 = train_byte_trigram_lm(ds, "text")
    scored2 = {r["id"]: r["bits_per_byte"] for r in lm_perplexity(ds, lm2, "text", "doc_id").take_all()}
    assert scored2 == scored


def test_lm_short_and_empty_docs():
    from blarify_ray.ops.text_analysis import lm_perplexity, train_byte_trigram_lm

    ds = rd.from_items(
        [{"doc_id": 0, "text": "hello world this is fine"},
         {"doc_id": 1, "text": ""},
         {"doc_id": 2, "text": "ab"}]
    )
    lm = train_byte_trigram_lm(ds, "text")
    rows = {r["id"]: r for r in lm_perplexity(ds, lm, "text", "doc_id").take_all()}
    assert rows[1]["n_windows"] == 0 and rows[1]["bits_per_byte"] == 0.0
    assert rows[2]["n_windows"] == 0
    assert rows[0]["n_windows"] == len("hello world this is fine".encode()) - 2
    assert rows[0]["bits_per_byte"] > 0


# --- Misra-Gries heavy hitters ------------------------------------------------


def test_heavy_hitters_bounds_and_recovery():
    from blarify_ray.ops.sketches import HeavyHitters

    rng = np.random.default_rng(3)
    # zipf-ish stream: planted heavy items + uniform noise
    items = (["hot_a"] * 5000 + ["hot_b"] * 3000 + ["hot_c"] * 1500
             + [f"w{i}" for i in rng.integers(0, 20_000, 30_000)])
    rng.shuffle(items)
    exact = {}
    for w in items:
        exact[w] = exact.get(w, 0) + 1
    # feed through 23 chunked summaries merged pairwise
    chunks = np.array_split(np.array(items, dtype=object), 23)
    acc = HeavyHitters(512)
    for ch in chunks:
        import pandas as pd

        vc = pd.Series(ch).value_counts()
        s = HeavyHitters(512)
        s.add_counts(vc.index.tolist(), vc.to_numpy())
        acc = acc.merge(s)
    top = acc.top(3)
    assert [w for w, _, _ in top] == ["hot_a", "hot_b", "hot_c"]
    for w, lo, hi in top:
        assert lo <= exact[w] <= hi
        assert hi - lo <= len(items) // 512  # MG error bound n/k


def test_heavy_hitter_words_matches_exact_topk():
    import pandas as pd
    import pyarrow.parquet as pq

    from blarify_ray.ops.sketches import heavy_hitter_words

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = rd.read_parquet(path, columns=["text"])
    top = heavy_hitter_words(ds, "text", n=10, k=4096)
    texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
    exact = pd.Series(texts).str.split(" ").explode().value_counts()
    got = [w for w, _, _ in top]
    # with k=4096 >> vocab the sketch is exact: counts and order match
    want = [w for w, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    assert got == want
    for w, lo, hi in top:
        assert lo <= exact[w] <= hi


# --- exact n-gram span duplicates ---------------------------------------------


def test_ngram_span_dups_planted():
    from blarify_ray.ops.dedup import ngram_span_dups

    shared = " ".join(f"tok{i}" for i in range(25))
    rng = np.random.default_rng(11)

    def noise(n):
        return " ".join(f"w{v}" for v in rng.integers(0, 10_000, n))

    rows = [
        {"doc_id": 0, "text": noise(30) + " " + shared + " " + noise(10)},
        {"doc_id": 1, "text": shared + " " + noise(40)},
        {"doc_id": 2, "text": noise(60)},
        {"doc_id": 3, "text": "short"},
    ]
    ds = rd.from_items(rows)
    out = ngram_span_dups(ds, "text", "doc_id", n_tokens=20).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r["pos"])
    # the shared 25-token run yields 25-20+1 = 6 window positions per doc
    assert sorted(by_doc[0]) == list(range(30, 36))  # after the 30 noise tokens
    assert sorted(by_doc[1]) == list(range(0, 6))
    assert 2 not in by_doc and 3 not in by_doc
    assert all(r["n_docs"] == 2 for r in out)


def test_ngram_span_removal_planted():
    """Keep-first semantics: doc 0 (lowest id) keeps the shared run,
    doc 1 loses EXACTLY the duplicated window union; untouched and
    short/null docs come back byte-identical with n_removed 0."""
    from blarify_ray.ops.dedup import ngram_span_removal

    shared = " ".join(f"tok{i}" for i in range(25))
    rng = np.random.default_rng(11)

    def noise(n):
        return " ".join(f"w{v}" for v in rng.integers(0, 10_000, n))

    rows = [
        {"doc_id": 0, "text": noise(30) + " " + shared + " " + noise(10)},
        {"doc_id": 1, "text": shared + " " + noise(40)},
        {"doc_id": 2, "text": noise(60)},
        {"doc_id": 3, "text": "short"},
        {"doc_id": 4, "text": None},
    ]
    ds = rd.from_items(rows)
    out = {r["id"]: r for r in ngram_span_removal(ds, "text", "doc_id", n_tokens=20).take_all()}
    assert set(out) == {0, 1, 2, 3, 4}
    # doc 0 is the canonical occurrence — untouched
    assert out[0]["text_clean"] == rows[0]["text"] and out[0]["n_removed"] == 0
    # doc 1: the 6 overlapping duplicate windows union to tokens [0, 25)
    want1 = " ".join(rows[1]["text"].split(" ")[25:])
    assert out[1]["text_clean"] == want1 and out[1]["n_removed"] == 25
    assert out[2]["text_clean"] == rows[2]["text"] and out[2]["n_removed"] == 0
    assert out[3]["text_clean"] == "short" and out[3]["n_removed"] == 0
    assert out[4]["text_clean"] == "" and out[4]["n_removed"] == 0
    # idempotence: cleaning the cleaned corpus removes nothing
    ds2 = rd.from_items(
        [{"doc_id": k, "text": v["text_clean"]} for k, v in out.items()]
    )
    out2 = {r["id"]: r for r in ngram_span_removal(ds2, "text", "doc_id", n_tokens=20).take_all()}
    assert all(r["n_removed"] == 0 for r in out2.values())
    assert all(out2[k]["text_clean"] == out[k]["text_clean"] for k in out)


# --- composed cleaning pipeline -------------------------------------------------


def test_clean_corpus_composition():
    """The composed pipeline must equal the set-algebra of its parts,
    computed independently here from the individual ops."""
    from blarify_ray.ops.dedup import exact_dedup, minhash_near_dup
    from blarify_ray.ops.text_analysis import (
        contamination,
        lang_id_text,
        quality_features,
    )
    from blarify_ray.pipelines.analytics_ext import CONTAM_MOD, CONTAM_WORDS
    from blarify_ray.pipelines.training_ops import q_clean_corpus_docs

    SF = "/root/testdata/sf0.001"
    got = {r["doc_id"] for r in q_clean_corpus_docs(SF).take_all()}

    import pyarrow.parquet as pq

    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    docs = rd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    keep = {r["doc_id"] for r in exact_dedup(docs, "text", "doc_id").take_all()}
    keep -= {r["id"] for r in minhash_near_dup(docs, "text", "doc_id").take_all()}
    snippets = [
        " ".join(texts[d].split(" ")[:CONTAM_WORDS])
        for d in sorted(texts)
        if d % CONTAM_MOD == 0
    ]
    contaminated = {
        r["doc_id"] for r in contamination(docs, "text", "doc_id", snippets).take_all()
    }
    keep -= {d for d in contaminated if d % CONTAM_MOD != 0}
    want = {
        d
        for d in keep
        if lang_id_text(texts[d])[0] in ("en", "und")
        and quality_features(texts[d])["quality"] >= 0.25
    }
    assert got == want
    assert got  # the pipeline keeps a nonempty corpus


def test_clean_corpus_forced_distributed_tier(monkeypatch):
    """Forcing the semi-/anti-join tier (no driver keep-set) must produce
    the broadcast tier's exact rows."""
    from blarify_ray.pipelines import training_ops

    SF = "/root/testdata/sf0.001"
    bcast = {
        (r["doc_id"], r["lang_pred"], r["quality"])
        for r in training_ops.q_clean_corpus_docs(SF).take_all()
    }
    monkeypatch.setattr(training_ops, "CLEAN_CORPUS_BROADCAST_MAX", 0)
    dist = {
        (r["doc_id"], r["lang_pred"], r["quality"])
        for r in training_ops.q_clean_corpus_docs(SF).take_all()
    }
    assert dist == bcast and bcast


def test_grouped_quantiles_per_key_accuracy():
    import pyarrow.parquet as pq

    from blarify_ray.ops.sketches import grouped_quantiles

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = rd.read_parquet(path, columns=["source", "n_chars"])
    rows = grouped_quantiles(ds, "source", "n_chars", [0.5, 0.9]).take_all()
    t = pq.read_table(path, columns=["source", "n_chars"])
    import pandas as pd

    df = t.to_pandas()
    by_src = dict(tuple(df.groupby("source")["n_chars"]))
    assert set(r["source"] for r in rows) == set(by_src)
    for r in rows:
        vals = by_src[r["source"]].to_numpy()
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            rank = float(np.mean(vals <= r[col]))
            assert abs(rank - q) <= 0.08, (r["source"], q, r[col], rank)


def test_audio_windows():
    """Window plumbing invariants on the synthetic audio payloads:
    only 'audio' rows fan out; offsets step by hop; every byte of the
    body is covered; the tail window may be short; features are a
    normalized FEATURE_DIM profile; deterministic."""
    from blarify_ray.ops.multimodal import audio_windows, synth_media_payload

    media = rd.from_arrow(synth_media_table(9))
    rows = audio_windows(media, win_bytes=40, hop_bytes=24).take_all()
    assert rows and all(r["media_id"] % 3 == 1 for r in rows)  # only audio
    by_m = {}
    for r in rows:
        by_m.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_m.items():
        rs.sort(key=lambda r: r["win_idx"])
        body_len = len(synth_media_payload(mid, "audio")) - 8  # SYNM+u16+u16
        assert [r["offset"] for r in rs] == [i * 24 for i in range(len(rs))]
        # full coverage: last window reaches the end of the body
        assert rs[-1]["offset"] + rs[-1]["n_bytes"] == body_len
        # overlapping windows truncate at the body end, never beyond
        assert all(r["n_bytes"] == min(40, body_len - r["offset"]) for r in rs)
        assert all(len(r["features"]) == FEATURE_DIM for r in rs)
        assert all(0.0 <= f <= 1.0 for r in rs for f in r["features"])
    rows2 = audio_windows(rd.from_arrow(synth_media_table(9)), win_bytes=40, hop_bytes=24).take_all()
    assert [r["features"][3] for r in rows] == [r["features"][3] for r in rows2]

    with _pytest.raises(ValueError):
        audio_windows(media, win_bytes=0)


def test_compression_ratio_signal():
    """Repetitive text compresses far better than high-entropy text; the
    op is deterministic and defined on empty/null docs."""
    import numpy as np_
    from blarify_ray.ops.text_analysis import compression_ratio

    rng = np_.random.RandomState(3)
    noisy = "".join(chr(33 + rng.randint(90)) for _ in range(2000))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["spam " * 400, noisy, "", None], pa.string()),
    }))
    out = {r["id"]: r for r in compression_ratio(docs, "text", "doc_id").take_all()}
    assert out[0]["zlib_ratio"] < 0.05          # repetition → tiny ratio
    assert out[1]["zlib_ratio"] > 0.5           # entropy → poor compression
    assert out[0]["raw_bytes"] == 2000
    assert out[2]["raw_bytes"] == 0 and out[3]["raw_bytes"] == 0
    assert out[2]["zlib_ratio"] == out[3]["zlib_ratio"] > 0


def test_ccnet_buckets(ray_session, tmp_path):
    """CCNet split invariants on a tmp corpus with clearly separated
    fluency tiers: every doc labeled, labels respect the bpb ordering
    exactly (head max <= middle min <= tail min thresholds), roughly a
    third each, deterministic."""
    import pyarrow.parquet as _pq
    import pandas as _pd
    import numpy as np_

    rng = np_.random.RandomState(9)
    common = "the cat sat on the mat and looked at the dog "
    rows = []
    for i in range(120):
        if i % 3 == 0:
            t = common * 6                                  # fluent → low bpb
        elif i % 3 == 1:
            t = " ".join(common.split()[: 5 + i % 7]) + " " + "zq" * (i % 5)
        else:
            t = "".join(chr(97 + rng.randint(26)) for _ in range(300))  # noise
        rows.append({"doc_id": i, "text": t})
    _pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    from blarify_ray.pipelines.training_ops import q_ccnet_buckets

    out = q_ccnet_buckets(str(tmp_path)).to_pandas()
    assert len(out) == 120 and set(out["bucket"]) == {"head", "middle", "tail"}
    h = out[out["bucket"] == "head"]["bits_per_byte"]
    m = out[out["bucket"] == "middle"]["bits_per_byte"]
    t = out[out["bucket"] == "tail"]["bits_per_byte"]
    assert h.max() <= m.min() and m.max() <= t.min()  # exact ordering contract
    for part in (h, m, t):
        assert 0.15 <= len(part) / 120 <= 0.55        # near-tercile split
    # the repeated fluent text must land in head, the noise in tail
    assert (out[out["doc_id"] % 3 == 0]["bucket"] == "head").all()
    assert (out[out["doc_id"] % 3 == 2]["bucket"] == "tail").all()
    out2 = q_ccnet_buckets(str(tmp_path)).to_pandas()
    _pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


# ---------------------------------------------------------------- bloom filter


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    """The membership contract: EVERY inserted key flags True (no false
    negatives, the property dedup/decontamination rely on); on a
    disjoint probe set the false-positive rate stays near the
    (1-e^{-kn/m})^k theory value."""
    import pyarrow as pa
    import ray.data as rd

    from blarify_ray.ops.sketches import BloomFilter, bloom_build, bloom_probe

    n = 20_000
    members = [f"doc-{i}" for i in range(n)]
    others = [f"other-{i}" for i in range(n)]
    ds = rd.from_arrow(pa.table({"key": members}))
    n_bits, k = 1 << 18, 7  # ~13 bits/key → theory fp ≈ 0.26%
    f = bloom_build(ds, "key", n_bits=n_bits, k=k)

    flags = (
        bloom_probe(rd.from_arrow(pa.table({"key": members})), "key", f)
        .to_pandas()["maybe_member"]
    )
    assert flags.all()  # zero false negatives, always

    fp = (
        bloom_probe(rd.from_arrow(pa.table({"key": others})), "key", f)
        .to_pandas()["maybe_member"]
        .mean()
    )
    theory = (1 - np.exp(-k * n / n_bits)) ** k
    assert fp < 5 * theory + 0.01  # same order as theory, not degenerate
    assert 0.0 < f.fill_ratio() < 0.6


def test_bloom_merge_is_or_and_deterministic(ray_session):
    """OR-merge algebra (retry-idempotent) + bit-level determinism: the
    distributed build equals a single-process build of the same keys."""
    import pyarrow as pa
    import ray.data as rd

    from blarify_ray.ops.sketches import BloomFilter, bloom_build

    keys = [f"k{i}" for i in range(5000)]
    one = BloomFilter(1 << 16, 5)
    one.add(keys)
    dist = bloom_build(
        rd.from_arrow(pa.table({"key": keys})).repartition(7), "key",
        n_bits=1 << 16, k=5,
    )
    assert np.array_equal(one.bits, dist.bits)
    # idempotent re-merge (a retried partial changes nothing)
    again = dist.merge(dist)
    assert np.array_equal(again.bits, dist.bits)
    # serialize round-trip
    back = BloomFilter.deserialize(dist.serialize(), 1 << 16, 5)
    assert np.array_equal(back.bits, dist.bits)


def test_minhash_cluster_tier_forced_distributed(ray_session):
    """minhash_near_dup with cc_driver_max_pairs=0 resolves clusters
    through the dataset-native min-label loop — output must equal the
    driver-tier result exactly (set of (id, dup_of) rows)."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG

    texts = []
    for i in range(30):
        base = (
            f"the quick brown fox jumps over the lazy dog number {i} "
            "while the farmer watches from the old wooden gate near the "
            "river bend and the afternoon sun warms the quiet field"
        )
        texts.append(base)
        if i % 3 == 0:  # near-dup: one word changed in a long text
            texts.append(base.replace("farmer", "rancher"))
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    def run(cfg):
        got = minhash_near_dup(ds, "text", "doc_id", cfg).take_all()
        return {(r["id"], r["dup_of"]) for r in got}

    want = run(DEFAULT_CONFIG)
    forced = run(dataclasses.replace(DEFAULT_CONFIG, cc_driver_max_pairs=0))
    assert want  # the planted near-dups actually cluster
    assert forced == want
