"""Null-payload parity: the engine and its DuckDB oracle must agree on
tables containing NULL text / k-less JSON payloads — the paths the
generated corpus never exercises (every fixed crash/divergence here had
a green oracle row on clean data)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blarify_ray.pipelines.analytics import ORACLE_SQL, QUERIES


def _write_sf(tmp_path, documents=None, events=None):
    sf = str(tmp_path)
    if documents is not None:
        pq.write_table(documents, os.path.join(sf, "documents.parquet"))
    if events is not None:
        pq.write_table(events, os.path.join(sf, "events.parquet"))
    return sf


def _oracle(sf, sql):
    con = duckdb.connect()
    for t in ("documents", "events"):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _assert_match(got, want):
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got, want = _norm(got), _norm(pd.DataFrame(want))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, rtol=1e-9
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), c


@pytest.fixture()
def null_docs_sf(tmp_path):
    # "alpha beta" repeats ≥ PMI_MIN_COUNT (5) times so the PMI result
    # is NON-empty — the null row must be skipped, not crash the engine
    texts = [
        "alpha beta gamma delta alpha beta one two",
        "alpha beta gamma delta epsilon zeta eta theta",
        None,
        "alpha beta gamma delta epsilon zeta eta theta",
        "",
        "alpha beta three four five six seven eight",
    ]
    srcs = ["s1", "s2", "s1", "s3", "s2", "s1"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        }
    )
    return _write_sf(tmp_path, documents=tbl)


def test_bigram_pmi_null_text(null_docs_sf):
    got = QUERIES["bigram_pmi_top"](null_docs_sf)
    want = _oracle(null_docs_sf, ORACLE_SQL["bigram_pmi_top"])
    _assert_match(got, want)


def test_cross_source_prefix_null_text(null_docs_sf):
    got = QUERIES["cross_source_prefix_dups"](null_docs_sf)
    want = _oracle(null_docs_sf, ORACLE_SQL["cross_source_prefix_dups"])
    _assert_match(got, want)
    # the shared clean prefix spans 3 distinct sources; no 'nan' group
    g = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert not (g["prefix"] == "nan").any()


def test_props_value_stats_missing_k(tmp_path):
    # one event type whose payloads NEVER carry k (SQL: SUM/MAX → NULL),
    # one mixed type, one normal type
    props = ['{"k": 3}', '{"k": -2}', "{}", '{"v": 9}', '{"k": 7}', "{}"]
    types = ["buy", "buy", "ghost", "ghost", "mix", "mix"]
    ev = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(
                [np.datetime64("2021-01-01T00:00:00", "us")] * 6,
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array([1.0] * 6, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )
    sf = _write_sf(tmp_path, events=ev)
    got = QUERIES["props_value_stats"](sf)
    want = _oracle(sf, ORACLE_SQL["props_value_stats"])
    _assert_match(got, want)
    g = (got.to_pandas() if hasattr(got, "to_pandas") else got).set_index("event_type")
    assert g.loc["ghost", "n_events"] == 2
    assert pd.isna(g.loc["ghost", "sum_k"]) and pd.isna(g.loc["ghost", "max_k"])
    assert g.loc["mix", "sum_k"] == 7 and g.loc["mix", "max_k"] == 7


def test_corpus_mixture_oversupplied_quota(tmp_path):
    """A source with fewer docs than its quota yields ALL its docs; the
    engine must match the oracle on this degenerate-supply table too."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array(["w"] * 10, pa.string()),
            "lang": pa.array(["en"] * 10, pa.string()),
            # src2 (even → LARGE quota 18) has only 3 docs; src1 (odd →
            # SMALL quota 7) has 7 docs exactly at the boundary
            "source": pa.array(["src2"] * 3 + ["src1"] * 7, pa.string()),
            "n_chars": pa.array([1] * 10, pa.int64()),
        }
    )
    sf = _write_sf(tmp_path, documents=tbl)
    got = QUERIES["corpus_mixture"](sf)
    want = _oracle(sf, ORACLE_SQL["corpus_mixture"])
    _assert_match(got, want)
    g = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert (g["source"] == "src2").sum() == 3  # whole under-supplied source
    assert (g["source"] == "src1").sum() == 7  # exact boundary
