"""k-NN graph construction: the exact tier against an independent
in-test numpy reference (full similarity matrix, no shared code paths),
IVF recall against the exact graph on clustered data, determinism, and
edge cases (k ≥ n, duplicate vectors with pinned tie-break)."""

import numpy as np
import pytest
import ray.data

from blarify_ray.ops.similarity import knn_graph_ivf, knn_join_exact


def _clustered(n=120, d=16, n_clusters=6, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 4
    vecs = centers[np.arange(n) % n_clusters] + rng.normal(size=(n, d)) * 0.3
    return np.arange(n, dtype=np.int64) * 7 + 1, vecs  # non-contiguous ids


def _ds(ids, vecs):
    return ray.data.from_items(
        [{"vec_id": int(i), "embedding": list(map(float, v))} for i, v in zip(ids, vecs)]
    )


def _reference(ids, vecs, k):
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    out = set()
    for i in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if ids[j] != ids[i]),
            key=lambda j: (-sims[i, j], ids[j]),
        )
        for r, j in enumerate(order[:k]):
            out.add((int(ids[i]), int(ids[j]), r))
    return out


def _got(ds):
    return {(r["vec_id"], r["nn_id"], r["rank"]) for r in ds.take_all()}


def test_exact_matches_independent_reference():
    ids, vecs = _clustered()
    got = _got(knn_join_exact(_ds(ids, vecs), k=5))
    assert got == _reference(ids, vecs, 5)


def test_exact_k_exceeds_n_and_empty():
    ids, vecs = _clustered(n=4)
    got = _got(knn_join_exact(_ds(ids, vecs), k=10))
    assert got == _reference(ids, vecs, 10)  # everyone gets n-1 neighbors
    empty = knn_join_exact(_ds(np.array([], np.int64), np.zeros((0, 4))), k=3)
    assert empty.count() == 0


def test_duplicate_vectors_tiebreak():
    # three identical vectors: sims tie at 1.0 — neighbor order must be
    # by ascending id, identically in exact and reference
    ids = np.array([30, 10, 20], np.int64)
    vecs = np.tile(np.array([1.0, 2.0, 3.0]), (3, 1))
    got = _got(knn_join_exact(_ds(ids, vecs), k=2))
    assert got == _reference(ids, vecs, 2)
    assert (10, 20, 0) in got and (10, 30, 1) in got


def test_ivf_recall_and_determinism():
    ids, vecs = _clustered(n=150)
    exact = _got(knn_join_exact(_ds(ids, vecs), k=5))
    approx1 = _got(knn_graph_ivf(_ds(ids, vecs), k=5, n_centroids=8, nprobe=3))
    approx2 = _got(knn_graph_ivf(_ds(ids, vecs), k=5, n_centroids=8, nprobe=3))
    assert approx1 == approx2  # deterministic end to end
    exact_pairs = {(a, b) for a, b, _ in exact}
    approx_pairs = {(a, b) for a, b, _ in approx1}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.8, recall
    # full probe = exact: nprobe covering all centroids recovers the graph
    full = _got(knn_graph_ivf(_ds(ids, vecs), k=5, n_centroids=8, nprobe=8))
    assert full == exact


def test_ivf_rows_well_formed():
    ids, vecs = _clustered(n=60)
    rows = knn_graph_ivf(_ds(ids, vecs), k=4, n_centroids=6, nprobe=2).take_all()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["vec_id"], []).append(r["rank"])
        assert r["vec_id"] != r["nn_id"]
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(len(ranks)))  # dense ranks from 0
        assert len(ranks) <= 4


def test_many_duplicates_tie_boundary():
    # MORE than k+1 vectors tied at sim 1.0: the cut must keep the k
    # smallest neighbor ids, not an arbitrary argpartition subset —
    # the contract the knn_graph DuckDB oracle (ORDER BY sim DESC,
    # nn_id) checks
    ids = np.array([70, 10, 50, 20, 60, 30, 40, 80], np.int64)
    vecs = np.tile(np.array([2.0, 1.0, 0.5]), (len(ids), 1))
    got = _got(knn_join_exact(_ds(ids, vecs), k=5))
    assert got == _reference(ids, vecs, 5)
    nbrs_of_80 = sorted((n for a, n, _ in got if a == 80))
    assert nbrs_of_80 == [10, 20, 30, 40, 50]
    # IVF path applies the same threshold-inclusive cut
    full = _got(knn_graph_ivf(_ds(ids, vecs), k=5, n_centroids=2, nprobe=2))
    assert full == got
