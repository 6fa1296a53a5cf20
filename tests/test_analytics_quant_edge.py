"""Adversarial-input checks for the analytics_quant battery: the
TPC-H-shaped oracle test exercises benign distributions; these tables
are built to hit the tricky paths — timestamp ties across and within
users, events exactly 7 days apart (RANGE boundary inclusivity),
single-event users, heavy value ties spanning NTILE bucket boundaries,
and n=1..5 groups where ⌈q·n⌉ rank math has off-by-one traps. Each case
still compares against the same DuckDB oracle SQL."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blarify_ray.pipelines.analytics_quant import (
    ORACLE_SQL_QUANT,
    QUERIES_QUANT,
)

_US = 1_000_000
_DAY = 86_400 * _US


def _events_table(tmp_path):
    rng = np.random.RandomState(11)
    rows = []
    eid = 0
    base = 1_700_000_000 * _US
    # 40 users: shared tie timestamps, exact-7d pairs, singletons
    for u in range(40):
        n = int(rng.randint(1, 12))
        for i in range(n):
            if i % 3 == 0:
                ts = base + (u % 5) * _DAY  # ties ACROSS users
            elif i % 3 == 1:
                ts = base + u * _DAY + i * 3600 * _US
            else:
                ts = base + u * _DAY + i * 3600 * _US  # tie WITHIN user
            rows.append((eid, ts, u, ["click", "view", "purchase", "signup"][i % 4],
                         float(rng.randint(-50, 500)) / 7.0))
            eid += 1
        # an exact 7-day-apart pair (boundary must be INSIDE the frame)
        rows.append((eid, base + u * _DAY, u, "click", 1.25)); eid += 1
        rows.append((eid, base + u * _DAY + 7 * _DAY, u, "click", 2.5)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    tbl = pa.Table.from_pydict(
        {
            "event_id": pa.array(df["event_id"], pa.int64()),
            "ts": pa.array(df["ts"], pa.timestamp("us")),
            "user_id": pa.array(df["user_id"], pa.int64()),
            "event_type": pa.array(df["event_type"], pa.string()),
            "value": pa.array(df["value"], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def _documents_table(tmp_path):
    rng = np.random.RandomState(13)
    rows = []
    did = 0
    # group sizes 1..5 (rank-math traps) + a 97-row group of heavy ties
    for li, n in enumerate([1, 2, 3, 4, 5]):
        for _ in range(n):
            rows.append((did, f"l{li}", f"s{li}", int(rng.randint(10, 30))))
            did += 1
    for i in range(97):
        rows.append((did, "big", "bigsrc", int([100, 100, 100, 200, 300][i % 5])))
        did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "source", "n_chars"])
    df["text"] = "x"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    for t in ["events", "documents"]:
        p = tmp_path / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["rolling_value_7d", "mode_event_per_user"]
)
def test_quant_events_edge_cases(ray_session, tmp_path, name):
    _events_table(tmp_path)
    got = QUERIES_QUANT[name](str(tmp_path))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(tmp_path, ORACLE_SQL_QUANT[name])
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


@pytest.mark.parametrize(
    "name", ["chars_percentiles_by_lang", "ntile_chars_by_source"]
)
def test_quant_docs_edge_cases(ray_session, tmp_path, name):
    _documents_table(tmp_path)
    got = QUERIES_QUANT[name](str(tmp_path))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(tmp_path, ORACLE_SQL_QUANT[name])
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
