"""Every analytics query must match its DuckDB oracle exactly
(order-insensitive, like the driver's value-hash check) at sf0.001."""

import os

import duckdb
import pandas as pd
import pytest

from blarify_ray.pipelines.analytics import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name):
    got = QUERIES[name](SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(ORACLE_SQL[name])
    got, want = _normalize(got), _normalize(want)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, rtol=1e-9
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"column {c} differs"


def test_stratified_sample_large_ids_match_oracle(tmp_path):
    """doc_id > ~3.4e9 overflows int64 in `id * 2654435761`; the engine
    hashes in uint64 (defined wraparound mod 2^32) and the oracle in
    HUGEINT — both must agree on the same large-id table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from blarify_ray.pipelines.analytics_win import (
        SQL_STRATIFIED_SAMPLE,
        q_stratified_sample_docs,
    )

    rng = np.random.RandomState(7)
    ids = np.unique(rng.randint(2**33, 2**62, size=200).astype(np.int64))
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array([f"s{i % 5}" for i in range(len(ids))], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = _normalize(q_stratified_sample_docs(str(tmp_path)).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = _normalize(con.sql(SQL_STRATIFIED_SAMPLE).df())
    assert got["h"].max() < 2**32 and got["h"].min() >= 0
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_names=False
    )


def test_order_priority_join_tiers_identical(monkeypatch):
    """Forced-tier: the distributed Dataset.join tier must produce the
    broadcast map-side tier's exact rows (both == the oracle)."""
    from blarify_ray.pipelines import analytics

    bc = analytics.q_order_priority_revenue(SF_DIR).to_pandas()
    monkeypatch.setattr(analytics, "JOIN_BROADCAST_MAX", 0)
    dist = analytics.q_order_priority_revenue(SF_DIR).to_pandas()
    bc, dist = _normalize(bc), _normalize(dist)
    assert list(bc.columns) == list(dist.columns)
    pd.testing.assert_frame_equal(
        bc.astype(str), dist.astype(str), check_names=False
    )
