"""SemDeDup (embedding-cluster semantic dedup) against planted ground
truth. With n_clusters=1 the op is exact brute-force dedup — planted
exact and near duplicates must be dropped against their lower-id twin
and nothing else. With real clustering, EXACT duplicates can never
split across clusters (identical rows → identical argmax), so they
must always drop, and no non-duplicate may ever be dropped; near dups
at a cluster boundary MAY escape — that is the documented SemDeDup
recall trade, not a bug. Determinism and the block-cap path are pinned
too."""

import numpy as np
import pyarrow as pa
import ray.data

from blarify_ray.ops.similarity import semdedup


def _planted(n_groups=6, seed=3):
    """Orthogonal-ish group centers; per group: one base vector (kept),
    one exact dup, one near dup (tiny noise), one far rotation (kept).
    ids are assigned so dup pairs are adjacent."""
    rng = np.random.RandomState(seed)
    d = 32
    centers = rng.randn(n_groups, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers = np.eye(n_groups, d) * 0.9 + centers * 0.1
    rows, expect_dropped, exact_pairs = [], {}, {}
    vid = 0
    for g in range(n_groups):
        base = centers[g]
        rows.append((vid, base)); base_id = vid; vid += 1
        rows.append((vid, base.copy()))  # exact dup
        expect_dropped[vid] = base_id
        exact_pairs[vid] = base_id
        vid += 1
        near = base + rng.randn(d) * 0.004
        rows.append((vid, near))  # near dup (cos ≈ 0.9999)
        expect_dropped[vid] = base_id; vid += 1
        far = base + rng.randn(d) * 2.0  # distinct direction
        rows.append((vid, far)); vid += 1
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [list(map(float, r[1])) for r in rows], pa.list_(pa.float64())
            ),
        }
    )
    return tbl, expect_dropped, exact_pairs


def test_semdedup_single_cluster_is_exact(ray_session):
    """n_clusters=1 → one cluster holds everything: the drop set equals
    the brute-force dominated-by-lower-id ground truth exactly."""
    tbl, expect, _ = _planted()
    ds = ray.data.from_arrow(tbl)
    out = semdedup(ds, threshold=0.98, n_clusters=1, partitions=4).to_pandas()
    dropped = dict(zip(out["vec_id"], out["dup_of"]))
    assert dropped == expect
    assert (out["cos"] >= 0.98).all()


def test_semdedup_clustered_sound(ray_session):
    """Multi-cluster run: exact dups ALWAYS drop (identical vectors
    cannot split across clusters), near dups may escape at boundaries,
    and nothing outside the planted set is ever dropped."""
    tbl, expect, exact_pairs = _planted()
    ds = ray.data.from_arrow(tbl)
    out = semdedup(ds, threshold=0.98, n_clusters=6).to_pandas()
    dropped = dict(zip(out["vec_id"], out["dup_of"]))
    for vid, base_id in exact_pairs.items():
        assert dropped.get(vid) == base_id, f"exact dup {vid} survived"
    assert set(dropped) <= set(expect)  # soundness: no false drops
    for vid, dup_of in dropped.items():
        assert dup_of == expect[vid]


def test_semdedup_deterministic(ray_session):
    tbl, _, _ = _planted(seed=9)
    ds = ray.data.from_arrow(tbl)
    a = semdedup(ds, threshold=0.98, n_clusters=4).to_pandas()
    b = semdedup(ds, threshold=0.98, n_clusters=4).to_pandas()
    a = a.sort_values(["vec_id"]).reset_index(drop=True)
    b = b.sort_values(["vec_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_semdedup_block_cap(ray_session):
    """max_cluster=2 over one big cluster: ids sorted → blocks
    [base, exact], [near, far] per group, so EXACTLY the adjacent exact
    pairs dedup and the near dups escape across the block boundary."""
    tbl, _, exact_pairs = _planted()
    ds = ray.data.from_arrow(tbl)
    out = semdedup(
        ds, threshold=0.98, n_clusters=1, partitions=4, max_cluster=2
    ).to_pandas()
    dropped = dict(zip(out["vec_id"], out["dup_of"]))
    assert dropped == exact_pairs


def test_semdedup_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
    )
    out = semdedup(ds, threshold=0.9)
    assert out.count() == 0
    assert out.schema().names == ["vec_id", "dup_of", "cos"]
