"""Exact prefix-filtered set-similarity join: completeness against a
brute-force all-pairs reference (the filter must miss NOTHING at the
threshold), forced verify-tier parity, hot-gram robustness (a gram in
every doc must not explode candidates), and boundary semantics (pairs
exactly at τ kept)."""

import dataclasses

import numpy as np
import pytest
import ray.data

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.ops.dedup import jaccard_pair_join

FORCED = dataclasses.replace(DEFAULT_CONFIG, dedup_candidate_broadcast_max=0)

K = 4


def _grams(txt):
    w = txt.split(" ")
    return {" ".join(w[j : j + K]) for j in range(len(w) - K + 1)}


def _brute(docs, tau):
    out = set()
    items = sorted(docs.items())
    for i, (a, ta) in enumerate(items):
        for b, tb in items[i + 1 :]:
            sa, sb = _grams(ta), _grams(tb)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= tau:
                out.add((a, b, inter / union))
    return out


def _corpus(seed=5, n=60, planted=6):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(n):
        words = list(rng.choice(vocab, size=30))
        # hot gram: the same 4-word opener in EVERY doc
        docs[i] = " ".join(["common open er gram"] + words)
    for i in range(planted):  # near-dup of doc i with a small edit
        base = docs[i].split(" ")
        base[10] = "edited"
        docs[n + i] = " ".join(base)
    return docs


def _ds(docs):
    return ray.data.from_items(
        [{"doc_id": int(k), "text": v} for k, v in docs.items()]
    )


def _got(ds):
    return {(r["d1"], r["d2"], r["jaccard"]) for r in ds.take_all()}


def test_matches_bruteforce_with_hot_gram():
    docs = _corpus()
    want = _brute(docs, 0.5)
    got = _got(jaccard_pair_join(_ds(docs), "text", "doc_id", tau=0.5))
    assert got == want
    assert len(want) >= 6  # the planted pairs are found


def test_forced_verify_tier_parity():
    docs = _corpus(seed=9, n=40, planted=4)
    a = _got(jaccard_pair_join(_ds(docs), "text", "doc_id", tau=0.5))
    b = _got(jaccard_pair_join(_ds(docs), "text", "doc_id", tau=0.5, cfg=FORCED))
    assert a == b and len(a) >= 4


def test_boundary_tau_inclusive():
    # two docs sharing exactly half their gram-universe: J = 1/3 < 0.5,
    # and an identical pair: J = 1.0; check >= is inclusive via tau=1.0
    docs = {1: "a b c d e f g h", 2: "a b c d e f g h", 3: "z y x w v u t s"}
    got = _got(jaccard_pair_join(_ds(docs), "text", "doc_id", tau=1.0))
    assert got == {(1, 2, 1.0)}


def test_low_tau_completeness():
    # lower threshold → larger prefixes; still exact vs brute force
    docs = _corpus(seed=13, n=30, planted=3)
    want = _brute(docs, 0.2)
    got = _got(jaccard_pair_join(_ds(docs), "text", "doc_id", tau=0.2))
    assert got == want
    assert len(want) >= len(_brute(docs, 0.5)) >= 3


def test_short_docs_no_grams():
    docs = {1: "a b", 2: "a b", 3: "a b c d e f"}  # <4 words → no shingles
    got = _got(jaccard_pair_join(_ds(docs), "text", "doc_id", tau=0.5))
    assert got == set()
