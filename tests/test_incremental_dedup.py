"""Incremental dedup against the persisted content-hash index: history
dups dropped, batch-internal dups collapsed, bucket-pruned probes."""

import os

import numpy as np
import pandas as pd
import ray.data as rd

from blarify_ray.ops.dedup import (
    HASH_INDEX_BUCKETS,
    build_hash_index,
    dedup_against_index,
)


def _docs(ids, texts):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})
    ).map_batches(lambda df: df, batch_format="pandas")


def test_history_and_internal_dups(tmp_path, ray_session):
    hist = _docs(range(10), [f"old text {i}" for i in range(10)])
    idx_dir = str(tmp_path / "hash_index")
    build_hash_index(hist, "text", "doc_id", idx_dir)
    assert any(d.startswith("bucket=") for d in os.listdir(idx_dir))

    new = _docs(
        [100, 101, 102, 103, 104, 105],
        [
            "old text 3",      # history dup → dropped
            "brand new A",     # fresh
            "brand new B",     # fresh
            "brand new A",     # internal dup of 101 → dropped (min id wins)
            "old text 7",      # history dup → dropped
            "brand new C",     # fresh
        ],
    )
    fresh, probed = dedup_against_index(new, "text", "doc_id", idx_dir)
    got = fresh.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [101, 102, 105]
    assert got["text"].tolist() == ["brand new A", "brand new B", "brand new C"]
    assert got["doc_id"].dtype == np.int64
    # probes are the new batch's hash buckets only
    assert probed and len(probed) <= 6 and all(0 <= b < HASH_INDEX_BUCKETS for b in probed)


def test_probe_prunes_to_single_bucket(tmp_path, ray_session):
    hist = _docs(range(50), [f"h {i}" for i in range(50)])
    idx_dir = str(tmp_path / "hash_index")
    build_hash_index(hist, "text", "doc_id", idx_dir)
    new = _docs([900], ["h 17"])  # one text → exactly one probed bucket
    fresh, probed = dedup_against_index(new, "text", "doc_id", idx_dir)
    assert len(probed) == 1
    assert fresh.count() == 0  # it's a history dup


def test_index_rebuild_atomic_and_first_owner(tmp_path, ray_session):
    # corpus with an internal dup: the index stores the MIN owner id
    hist = _docs([5, 2, 9], ["same", "same", "other"])
    idx_dir = str(tmp_path / "hash_index")
    build_hash_index(hist, "text", "doc_id", idx_dir)
    import duckdb

    rows = duckdb.sql(
        f"SELECT md5, owner_id FROM read_parquet('{idx_dir}/bucket=*/*.parquet', "
        f"hive_partitioning=1) ORDER BY md5"
    ).df()
    assert len(rows) == 2 and set(rows["owner_id"]) == {2, 9}
    # rebuild lands atomically with identical content
    build_hash_index(hist, "text", "doc_id", idx_dir)
    rows2 = duckdb.sql(
        f"SELECT md5, owner_id FROM read_parquet('{idx_dir}/bucket=*/*.parquet', "
        f"hive_partitioning=1) ORDER BY md5"
    ).df()
    pd.testing.assert_frame_equal(rows.reset_index(drop=True), rows2.reset_index(drop=True))
