"""Forced-tier parity for the extended battery's size-tiered fact joins
(the oracle match itself is covered by the parametrized
test_analytics_oracle.py over the merged ORACLE_SQL registry)."""

import pandas as pd
import pytest

from blarify_ray.pipelines import analytics_ext

SF_DIR = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "qname", ["ship_priority_mix", "region_revenue", "nation_pair_volume"]
)
def test_ext_join_tiers_identical(monkeypatch, qname):
    """Broadcast map-side tier == hash-co-partitioned tier, row for row."""
    fn = analytics_ext.QUERIES_EXT[qname]
    bc = fn(SF_DIR).to_pandas()
    monkeypatch.setattr(analytics_ext, "EXT_JOIN_BROADCAST_MAX", 0)
    dist = fn(SF_DIR).to_pandas()
    bc, dist = _norm(bc), _norm(dist)
    assert list(bc.columns) == list(dist.columns)
    pd.testing.assert_frame_equal(bc.astype(str), dist.astype(str), check_names=False)


def test_large_volume_empty_threshold(monkeypatch):
    """An impossible HAVING threshold yields an empty, correctly-typed
    frame (the output-scale assembly path must not KeyError on zero
    qualifying orders)."""
    monkeypatch.setattr(analytics_ext, "LARGE_VOLUME_QTY", 10**9)
    out = analytics_ext.q_large_volume_customers(SF_DIR)
    assert list(out.columns) == ["c_name", "o_orderkey", "o_orderdate", "total_qty"]
    assert len(out) == 0


def test_word_repetition_is_map_only():
    """The per-doc metrics op must not introduce a shuffle: consistency
    invariant — distinct count never exceeds total, max count bounded."""
    out = analytics_ext.q_word_repetition_docs(SF_DIR).to_pandas()
    assert len(out) > 0
    assert (out["n_distinct"] <= out["n_words"]).all()
    assert (out["top_word_count"] <= out["n_words"]).all()
    assert (out["top_word_count"] * out["n_distinct"] >= out["n_words"]).all()
