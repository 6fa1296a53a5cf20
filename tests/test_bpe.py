"""BPE training/encoding: hand-checkable merges on a tiny corpus, parity
with an independent in-test reference implementation, determinism, and
the distributed wordcount → driver merge-learning split."""

from collections import Counter

import numpy as np
import ray.data as rd

from blarify_ray.ops.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    learn_merges,
    train_bpe,
    word_counts,
)


def _reference_merges(vocab, n_merges):
    """Slow, obviously-correct BPE (recount all pairs every round)."""
    words = {i: list(w) + [EOW] for i, (w, _) in enumerate(vocab)}
    freqs = {i: f for i, (_, f) in enumerate(vocab)}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] += freqs[i]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def test_learn_merges_matches_reference():
    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("low", 1)]
    got = learn_merges(vocab, 10)
    want = _reference_merges(vocab, 10)
    assert got == want
    # classic Sennrich example: 'es' (freq 9) merges before anything else
    assert got[0] == ("e", "s")


def test_learn_merges_deterministic_and_stops():
    vocab = [("abc", 3), ("abd", 3)]
    m1 = learn_merges(vocab, 50)
    m2 = learn_merges(vocab, 50)
    assert m1 == m2
    # stops when no pair repeats — never pads to n_merges
    assert len(m1) < 50


def test_encode_word_applies_ranks_in_order():
    merges = [("e", "s"), ("es", "t"), ("est", EOW)]
    rank = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", rank) == ["n", "e", "w", "est" + EOW]
    assert encode_word("best", rank) == ["b", "est" + EOW]
    assert encode_word("xyz", rank) == ["x", "y", "z", EOW]


def test_train_and_encode_dataset():
    rows = [
        {"doc_id": 0, "text": "the newest widest low lower"},
        {"doc_id": 1, "text": "newest newest low"},
        {"doc_id": 2, "text": ""},
    ]
    ds = rd.from_items(rows)
    wc = dict(word_counts(ds, "text"))
    assert wc["newest"] == 3 and wc["low"] == 2 and "" not in wc
    merges = train_bpe(ds, "text", n_merges=8)
    assert merges == _reference_merges(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0])), 8)
    out = {r["id"]: r for r in bpe_encode(ds, merges, "text", "doc_id").take_all()}
    assert out[2]["n_words"] == 0 and out[2]["n_tokens"] == 0
    assert out[1]["n_words"] == 3
    rank = {p: i for i, p in enumerate(merges)}
    want_tokens = sum(len(encode_word(w, rank)) for w in "newest newest low".split())
    assert out[1]["n_tokens"] == want_tokens
    # merging strictly compresses vs character tokenization
    char_tokens = sum(len(w) + 1 for w in "newest newest low".split())
    assert out[1]["n_tokens"] < char_tokens


def test_encode_null_text_counts_zero():
    """A NULL text row must count 0 words / 0 tokens — a NaN surviving
    into factorize used to get code -1 and silently index the LAST
    unique word."""
    import pandas as pd

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["low lower", None, "newest"]}
    )
    ds = rd.from_pandas(df)
    merges = train_bpe(ds, "text", n_merges=4)
    out = {r["id"]: r for r in bpe_encode(ds, merges, "text", "doc_id").take_all()}
    assert out[1]["n_words"] == 0 and out[1]["n_tokens"] == 0
    assert out[0]["n_words"] == 2 and out[2]["n_words"] == 1


def test_bpe_corpus_scale_sanity():
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    merges = train_bpe(ds, "text", n_merges=64)
    assert len(merges) == 64
    out = bpe_encode(ds, merges, "text", "doc_id").take_all()
    assert len(out) == 500
    n_tok = np.array([r["n_tokens"] for r in out])
    n_words = np.array([r["n_words"] for r in out])
    assert (n_tok[n_words > 0] >= n_words[n_words > 0]).all()  # ≥1 token/word
