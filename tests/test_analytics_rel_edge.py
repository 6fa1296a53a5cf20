"""Adversarial-input checks for the analytics_rel battery: the
TPC-H-shaped oracle test exercises benign distributions; these tables
hit the tricky paths — shipdates EXACTLY 90 days after the order date
(strict-> boundary), single-supplier all-late orders (EXISTS must
fail), two-late-supplier orders (NOT-EXISTS must fail), a supplier
whose lines for one order straddle batch partials (the MAX-merge path),
brand-min price ties (every tied row kept), negative / whitespace /
missing JSON payloads, and profiler columns with one distinct value.
Each case still compares against the same DuckDB oracle SQL."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blarify_ray.pipelines.analytics_rel import ORACLE_SQL_REL, QUERIES_REL

_US = 1_000_000
_DAY = 86_400 * _US
_BASE = 1_600_000_000 * _US


def _ts(day: int) -> int:
    return _BASE + day * _DAY


def _late_tables(tmp_path):
    # orders o1..o6 all placed on day 0
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5, 6],
            "o_orderdate": [_ts(0)] * 6,
        }
    )
    li = []  # (orderkey, suppkey, ship_day)
    # o1: suppliers 10 (late) + 11 (on time) → 10 qualifies
    li += [(1, 10, 120), (1, 11, 30)]
    # o2: supplier 10 alone and late → no second supplier, excluded
    li += [(2, 10, 200)]
    # o3: suppliers 10 and 11 BOTH late → excluded for both
    li += [(3, 10, 95), (3, 11, 100)]
    # o4: supplier 12 ships day 90 EXACTLY (not late, strict >),
    #     supplier 13 ships day 91 (late) → 13 qualifies
    li += [(4, 12, 90), (4, 13, 91)]
    # o5: supplier 14 has many lines, only ONE late — spread across
    #     enough rows that batch partials split the (order, supplier)
    #     group; supplier 15 on time → 14 qualifies via MAX-merge
    li += [(5, 14, d) for d in range(1, 60)] + [(5, 14, 150)]
    li += [(5, 15, 10)]
    # o6: nobody late → excluded
    li += [(6, 10, 5), (6, 11, 6)]
    lidf = pd.DataFrame(li, columns=["l_orderkey", "l_suppkey", "day"])
    pq.write_table(
        pa.Table.from_pydict(
            {
                "o_orderkey": pa.array(orders["o_orderkey"], pa.int64()),
                "o_orderdate": pa.array(orders["o_orderdate"], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(lidf["l_orderkey"], pa.int64()),
                "l_suppkey": pa.array(lidf["l_suppkey"], pa.int64()),
                "l_shipdate": pa.array(
                    [_ts(d) for d in lidf["day"]], pa.timestamp("us")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )


def _part_table(tmp_path):
    # BrandA: min 5.0 held by TWO parts (tie → both rows kept);
    # BrandB: single part (its own min); BrandC: min differs from the
    # global min (per-group scalar must not leak across groups)
    df = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4, 5, 6],
            "p_name": ["a1", "a2", "a3", "b1", "c1", "c2"],
            "p_brand": ["BrandA", "BrandA", "BrandA", "BrandB", "BrandC", "BrandC"],
            "p_retailprice": [5.0, 5.0, 9.99, 42.125, 7.5, 7.75],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "part.parquet"),
    )


def _events_table(tmp_path):
    # negative k, whitespace variants, large k, extra members around k
    props = [
        '{"k": 7}',
        '{"k":-3}',
        '{"k":   42}',
        '{"a": 1, "k": 9, "z": 2}',
        '{"k": 123456789012}',
        '{"k": 0}',
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(props), dtype=np.int64),
            "ts": pd.to_datetime([_BASE + i * _US for i in range(len(props))], unit="us"),
            "user_id": np.zeros(len(props), np.int64),
            "event_type": ["click", "click", "view", "view", "error", "error"],
            "value": np.zeros(len(props), np.float64),
            "props": props,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )


def _lineitem_profile_table(tmp_path):
    # one column constant (ndv=1), negatives, a value repeated across
    # what will be several read batches
    n = 400
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_shipdate": pd.to_datetime([_BASE] * n, unit="us"),
            "l_quantity": rng.choice([1.0, 2.0, 3.0], n),
            "l_discount": np.full(n, 0.05),
            "l_tax": rng.choice([-0.01, 0.0, 0.04], n),
            "l_linenumber": rng.randint(1, 3, n).astype(np.int32),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    for t in ["orders", "lineitem", "part", "events"]:
        p = tmp_path / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _check(tmp_path, name):
    got = QUERIES_REL[name](str(tmp_path))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(tmp_path, ORACLE_SQL_REL[name])
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
    return got


def test_sole_late_supplier_edge_cases(ray_session, tmp_path):
    _late_tables(tmp_path)
    got = _check(tmp_path, "sole_late_supplier")
    # pin the semantics, not just oracle parity: exactly 10(o1), 13(o4),
    # 14(o5) qualify, once each
    assert dict(zip(got["s_suppkey"], got["numwait"])) == {10: 1, 13: 1, 14: 1}


def test_cheapest_part_ties_kept(ray_session, tmp_path):
    _part_table(tmp_path)
    got = _check(tmp_path, "cheapest_part_per_brand")
    assert sorted(got["p_partkey"]) == [1, 2, 4, 5]  # both BrandA ties


def test_props_extraction_edge_cases(ray_session, tmp_path):
    _events_table(tmp_path)
    got = _check(tmp_path, "props_value_stats")
    assert dict(zip(got["event_type"], got["sum_k"])) == {
        "click": 4,  # 7 + (-3)
        "view": 51,  # 42 + 9
        "error": 123456789012,
    }


def test_profile_constant_and_negative_columns(ray_session, tmp_path):
    _lineitem_profile_table(tmp_path)
    got = _check(tmp_path, "lineitem_profile")
    row = got[got["col"] == "l_discount"].iloc[0]
    assert row["ndv"] == 1 and row["min_v"] == row["max_v"] == 0.05
    assert got[got["col"] == "l_tax"].iloc[0]["min_v"] == -0.01
