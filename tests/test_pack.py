"""Adversarial-input checks for the sequence-packing battery: the
sf0.001 oracle test runs on dense doc_ids (bucket width 1); these
tables force the width>1 range-bucketing path — sparse ids spanning a
huge range (many docs per bucket, empty buckets between), empty texts
(token count 1, same as the SQL), whitespace-only texts, and docs
longer than one chunk — still compared against the same DuckDB SQL."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from blarify_ray.pipelines.analytics_pack import (
    ORACLE_SQL_PACK,
    PACK_CHUNK_TOKENS,
    QUERIES_PACK,
)


def _write_docs(tmp_path, ids, texts):
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def _oracle(tmp_path, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_pack_chunks_sparse_ids_match_oracle(tmp_path, ray_session):
    rng = np.random.RandomState(23)
    # ids spread over [0, 5M): bucket width > 1, multiple docs per
    # bucket, long empty bucket runs
    ids = np.unique(rng.randint(0, 5_000_000, size=400).astype(np.int64))
    texts = []
    for i, _ in enumerate(ids):
        if i % 17 == 0:
            texts.append("")  # counts 1 token on both sides
        elif i % 17 == 1:
            texts.append(" \t\n ")  # strips to empty → 1 token
        elif i % 11 == 0:
            texts.append("w " * (PACK_CHUNK_TOKENS * 3))  # spans chunks
        else:
            texts.append(" ".join(f"t{j}" for j in range(int(rng.randint(1, 40)))))
    _write_docs(tmp_path, ids, texts)

    got = _norm(QUERIES_PACK["pack_chunks_docs"](str(tmp_path)).to_pandas())
    want = _norm(_oracle(tmp_path, ORACLE_SQL_PACK["pack_chunks_docs"]))
    pd.testing.assert_frame_equal(got, want)
    # global-stream invariants: offsets strictly increase by n_tokens
    g = got.sort_values("doc_id").reset_index(drop=True)
    assert (
        g["start_tok"].to_numpy()[1:]
        == (g["start_tok"] + g["n_tokens"]).to_numpy()[:-1]
    ).all()
    assert int(g["start_tok"].iloc[0]) == 0
    assert (g["chunk_last"] >= g["chunk_first"]).all()


def test_pack_chunks_single_doc(tmp_path, ray_session):
    _write_docs(tmp_path, [7], ["a b c"])
    got = _norm(QUERIES_PACK["pack_chunks_docs"](str(tmp_path)).to_pandas())
    want = _norm(_oracle(tmp_path, ORACLE_SQL_PACK["pack_chunks_docs"]))
    pd.testing.assert_frame_equal(got, want)
    assert got["n_tokens"].tolist() == [3] and got["start_tok"].tolist() == [0]
