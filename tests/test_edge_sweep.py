"""Cross-battery adversarial edge sweep: ONE tiny, nasty, but
schema-exact SF directory (all 10 tables), and EVERY registered oracle
query compared against its DuckDB SQL on it. The standard oracle test
runs on the benign generated corpus; this table set is built to hit the
paths that corpus never takes —

- empty / whitespace-only / single-word / all-same-word / unicode /
  500-char-single-token documents; exact cross-source duplicate texts;
  shared 8-word prefixes; a sparse 1,000,000 doc_id,
- money values at the .005 half-cent rounding edge (positive AND
  negative), zero and 1e7 totals,
- timestamp TIES within and across users, events exactly at hour / day
  boundaries, a gap of exactly SESSION_GAP_S (must NOT split: rule is
  strictly greater), purchase-at-signup-instant funnels and a
  purchase-BEFORE-signup user,
- one-order customers, an order-less customer, a nation-less region, a
  supplier-less nation, single-lineitem orders, shipdate == orderdate,
- duplicate and near-parallel embeddings, a 1e-3-norm vector, duplicate
  brands with exact retail-price ties.

Any engine/oracle divergence here is a real bug (both sides read the
same parquet)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blarify_ray.pipelines.analytics import ORACLE_SQL, QUERIES

US = 1_000_000
HOUR = 3600 * US
DAY = 24 * HOUR


def _ts(base_us):
    return pa.array(np.asarray(base_us, dtype="int64"), pa.timestamp("us"))


def _build_sf(root: str) -> str:
    t0 = 1_704_153_600 * US  # 2024-01-02 00:00:00 UTC — exact hour/day edge

    # --- region / nation: region 2 has NO nations; nation 4 has no rows below
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE", "AMERICA"], pa.string()),
    }), os.path.join(root, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3, 4], pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(5)], pa.string()),
        "n_regionkey": pa.array([0, 0, 1, 1, 1], pa.int32()),
    }), os.path.join(root, "nation.parquet"))

    # --- customer: 8 edges — cust 7 has NO orders; acctbal 0 / negative
    pq.write_table(pa.table({
        "c_custkey": pa.array(list(range(8)), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(8)], pa.string()),
        "c_nationkey": pa.array([0, 0, 1, 1, 2, 2, 3, 3], pa.int32()),
        "c_acctbal": pa.array([0.0, -10.005, 55.5, 100.005, 7.0, 7.0, 9999.99, 3.0]),
        "c_mktsegment": pa.array(
            ["BUILDING", "BUILDING", "AUTOMOBILE", "MACHINERY",
             "FURNITURE", "HOUSEHOLD", "BUILDING", "AUTOMOBILE"], pa.string()),
    }), os.path.join(root, "customer.parquet"))

    # --- supplier: nation 4 has no supplier; negative balance
    pq.write_table(pa.table({
        "s_suppkey": pa.array([0, 1, 2, 3], pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(4)], pa.string()),
        "s_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "s_acctbal": pa.array([-1.0, 0.0, 10.5, 10.5]),
    }), os.path.join(root, "supplier.parquet"))

    # --- part: Brand#1 has an exact min-price TIE (parts 0 and 1);
    # Brand#2 single part; p_size 0
    pq.write_table(pa.table({
        "p_partkey": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "p_name": pa.array(["cold widget", "small widget", "hot widget",
                            "dim widget", "dry widget", "wet widget"], pa.string()),
        "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#1",
                             "Brand#2", "Brand#3", "Brand#3"], pa.string()),
        "p_type": pa.array(["ECONOMY", "PROMO", "STANDARD",
                            "PROMO", "LARGE", "SMALL"], pa.string()),
        "p_size": pa.array([0, 5, 50, 1, 9, 9], pa.int32()),
        "p_retailprice": pa.array([10.0, 10.0, 25.005, 0.0, 3.5, 1e5]),
    }), os.path.join(root, "part.parquet"))

    # --- orders: cust 1 heavy (6 orders), several one-order customers,
    # status 'P' exactly once, totalprice at ±.005 edges, ties in dates
    d0 = 820_454_400 * US  # 1996-01-01
    ok = list(range(20))
    oc = [1, 1, 1, 1, 1, 1, 2, 3, 4, 5, 6, 0, 2, 3, 4, 5, 6, 0, 2, 3]
    ost = ["F", "O", "F", "O", "F", "O", "P", "F", "O", "F",
           "O", "F", "O", "F", "O", "F", "O", "F", "O", "F"]
    tot = [100.005, -0.005, 0.0, 1e7, 55.555, 1.005, 2.5, 2.5, 300.0, 0.005,
           42.0, 9.99, 77.7, 100.005, 5.0, 63.0, 8.0, 12.005, 250.0, 31.0]
    odate = [d0, d0, d0 + 31 * DAY, d0 + 31 * DAY, d0 + 365 * DAY,
             d0 + 366 * DAY, d0, d0 + 90 * DAY, d0 + 90 * DAY, d0 + 90 * DAY,
             d0 + 180 * DAY, d0 + 180 * DAY, d0 + 400 * DAY, d0 + 400 * DAY,
             d0 + 400 * DAY, d0 + 500 * DAY, d0 + 500 * DAY, d0 + 730 * DAY,
             d0 + 730 * DAY, d0 + 730 * DAY]
    op = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"] * 4
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_custkey": pa.array(oc, pa.int64()),
        "o_orderstatus": pa.array(ost, pa.string()),
        "o_totalprice": pa.array(tot),
        "o_orderdate": _ts(odate),
        "o_orderpriority": pa.array(op, pa.string()),
    }), os.path.join(root, "orders.parquet"))

    # --- lineitem: single-item orders, an 8-item order, shipdate ==
    # orderdate (late-boundary), qty 1..50, discount 0/0.1, ±.005 prices,
    # order 0 has suppliers 0+1 with only supplier 1 late (Q21 shape)
    rows = []
    # order 0: multi-supplier; supplier 0 ships on order date, 1 ships late
    rows.append((0, 0, 0, 1, 1.0, 100.005, 0.0, 0.01, "A", "F", d0))
    rows.append((0, 1, 1, 2, 2.0, 50.0, 0.1, 0.0, "N", "O", d0 + 40 * DAY))
    # order 1: 8 items, one supplier, mixed flags, rounding edges
    for i in range(8):
        rows.append((1, i % 6, 2, i + 1, float(i + 1), 10.005 * (i + 1),
                     [0.0, 0.05, 0.1][i % 3], 0.02, "ANR"[i % 3], "FO"[i % 2],
                     d0 + i * DAY))
    # single-item orders incl. qty edges for Q17 (small qty on a brand part)
    rows.append((6, 3, 3, 1, 1.0, 5.0, 0.0, 0.0, "R", "F", d0 + 3 * DAY))
    rows.append((7, 3, 3, 1, 2.0, 5.0, 0.0, 0.0, "R", "F", d0 + 91 * DAY))
    rows.append((8, 3, 3, 1, 50.0, 500.0, 0.02, 0.0, "N", "O", d0 + 92 * DAY))
    rows.append((9, 4, 0, 1, 3.0, -0.005, 0.0, 0.0, "A", "F", d0 + 93 * DAY))
    rows.append((10, 5, 1, 1, 7.0, 0.0, 0.1, 0.1, "N", "F", d0 + 181 * DAY))
    rows.append((12, 0, 2, 1, 4.0, 33.335, 0.04, 0.0, "R", "O", d0 + 401 * DAY))
    rows.append((13, 1, 2, 1, 4.0, 33.335, 0.04, 0.0, "R", "O", d0 + 401 * DAY))
    rows.append((18, 2, 3, 1, 20.0, 2000.0, 0.07, 0.01, "A", "F", d0 + 731 * DAY))
    rows.append((19, 5, 0, 1, 1.0, 1.005, 0.0, 0.0, "N", "O", d0 + 731 * DAY))
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(cols[0], pa.int64()),
        "l_partkey": pa.array(cols[1], pa.int64()),
        "l_suppkey": pa.array(cols[2], pa.int64()),
        "l_linenumber": pa.array(cols[3], pa.int32()),
        "l_quantity": pa.array(cols[4]),
        "l_extendedprice": pa.array(cols[5]),
        "l_discount": pa.array(cols[6]),
        "l_tax": pa.array(cols[7]),
        "l_returnflag": pa.array(cols[8], pa.string()),
        "l_linestatus": pa.array(cols[9], pa.string()),
        "l_shipdate": _ts(cols[10]),
    }), os.path.join(root, "lineitem.parquet"))

    # --- events: skewed user 1; tie timestamps (same AND different
    # event_id); exact hour/day boundaries; gap of EXACTLY 1800 s (must
    # not split a session); funnel lag 0 (signup==purchase instant) and
    # purchase-before-signup; value at ±.005
    ev = []
    eid = 0
    for i in range(15):  # user 1: every 20 min from the day boundary
        ev.append((eid, t0 + i * 20 * 60 * US, 1,
                   ["click", "view", "purchase", "signup", "error"][i % 5],
                   [0.005, -0.005, 0.0, 1.005, 123.45][i % 5], '{"k": %d}' % i))
        eid += 1
    ev.append((eid, t0, 2, "click", 1.0, "{}")); eid += 1  # single-event user
    # user 3: signup and purchase at the SAME instant (lag 0)
    ev.append((eid, t0 + HOUR, 3, "signup", 0.0, '{"k": 1}')); eid += 1
    ev.append((eid, t0 + HOUR, 3, "purchase", 10.0, '{"k": 2}')); eid += 1
    # user 4: purchase BEFORE signup
    ev.append((eid, t0, 4, "purchase", 5.0, '{"k": 3}')); eid += 1
    ev.append((eid, t0 + DAY, 4, "signup", 0.0, '{"k": 4}')); eid += 1
    # user 5: gap exactly 1800 s (one session), then 1801 s (split)
    ev.append((eid, t0, 5, "view", 1.0, '{"k": 5}')); eid += 1
    ev.append((eid, t0 + 1800 * US, 5, "view", 1.0, '{"k": 6}')); eid += 1
    ev.append((eid, t0 + 1800 * US + 1801 * US, 5, "view", 1.0, '{"k": 7}')); eid += 1
    # user 6: two events at one instant, distinct ids (tie across rows)
    ev.append((eid, t0 + 2 * HOUR, 6, "click", 2.0, '{"k": 8}')); eid += 1
    ev.append((eid, t0 + 2 * HOUR, 6, "view", 3.0, '{"k": 9}')); eid += 1
    # user 7: events exactly one day apart (daily-burst boundary)
    for i in range(3):
        ev.append((eid, t0 + i * DAY, 7, "click", 1.0, "{}")); eid += 1
    # user 8: a COMPLETE view→click→purchase funnel (strictly ordered)
    ev.append((eid, t0, 8, "view", 1.0, "{}")); eid += 1
    ev.append((eid, t0 + 60 * US, 8, "click", 1.0, "{}")); eid += 1
    ev.append((eid, t0 + 120 * US, 8, "purchase", 9.99, "{}")); eid += 1
    ev.append((eid, t0 + 130 * US, 8, "signup", 0.0, "{}")); eid += 1
    cols = list(zip(*ev))
    pq.write_table(pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": _ts(cols[1]),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4]),
        "props": pa.array(cols[5], pa.string()),
    }), os.path.join(root, "events.parquet"))

    # --- documents: the text zoo (doc 0 donates the contamination
    # snippet "alpha beta" and repeats the bigram 5× for PMI)
    texts = [
        "alpha beta alpha beta alpha beta alpha beta alpha beta",  # 0
        "",                                                        # 1
        " \t\n ",                                                  # 2
        "solo",                                                    # 3
        " ".join(["dup"] * 30),                                    # 4
        "xx alpha beta yy zz qq rr ss tt",                         # 5
        "xx alpha beta yy zz qq rr ss tt",                         # 6 exact dup, other source
        "xx alpha beta yy zz qq rr ss uu vv ww",                   # 7 shared 8-word prefix
        "naïve café 東京 — em–dash",   # 8 unicode
        "w" * 500,                                                 # 9 one long token
        "12345 !!! ??? ,,,, 6789",                                 # 10
        "alpha beta",                                              # 11
        "big id doc",                                              # 1,000,000
    ]
    ids = list(range(12)) + [1_000_000]
    langs = ["en", "en", "en", "de", "en", "fr", "fr", "fr", "zh", "en", "es", "en", "en"]
    srcs = ["src0", "src0", "src0", "src1", "src0", "src2", "src3", "src4",
            "src5", "src0", "src0", "src0", "src6"]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(root, "documents.parquet"))

    # --- embeddings: vec 0/1 EXACT duplicates (identical bytes → each
    # side computes bit-identical cosines → the nn_id tie-break is
    # deterministic on both sides), vec 2 clearly-near (cos ≈ 0.9999,
    # far above every other pair but well separated from 1.0 — parallel
    # or ε-scaled vectors would make the engine-vs-DuckDB ranking
    # ULP-ambiguous), a tiny-norm vector in its OWN direction, -base;
    # ids 0..11 (queries use 0,1,2)
    rng = np.random.RandomState(5)
    base = rng.randn(8)
    vecs = [base, base.copy(), base + rng.randn(8) * 1e-2,
            rng.randn(8) * 1e-3, -base]
    for i in range(7):
        vecs.append(rng.randn(8))
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(12)), pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(12)], pa.int32()),
    }), os.path.join(root, "embeddings.parquet"))
    return root


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("edge_sf")
    return _build_sf(str(root))


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


# Rows-only queries that consume sf_dir tables directly (the kg_*
# battery synthesizes its own page corpus and is covered by the
# serial-golden tests). No SQL oracle exists for these; the edge bar
# is: runs to completion and yields a well-formed frame on the nasty
# tables (empty/whitespace/unicode texts, duplicate embeddings, a
# 1e-3-norm vector, a sparse 1,000,000 doc_id).
ROWS_ONLY_SF_CONSUMERS = [
    "media_features", "approx_distinct_users", "approx_distinct_users_by_type",
    "minhash_dedup_docs", "simhash_docs", "simhash_pairs_docs",
    "lang_id_docs", "quality_docs", "fingerprints_docs",
    "vector_topk_ivf", "vector_topk_pq", "knn_graph_ivf", "embedding_near_dup",
    "doc_length_quantiles", "lm_perplexity_docs", "bpe_token_counts",
    "heavy_words_docs", "clean_corpus_docs", "source_length_quantiles",
    "semdedup_embeddings",
]


@pytest.mark.parametrize("name", ROWS_ONLY_SF_CONSUMERS)
def test_edge_sweep_rows_only_runs(name, edge_sf, ray_session):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry___edge", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    got = m.queries()[name](edge_sf)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    assert isinstance(got, pd.DataFrame)
    assert len(got) >= 0  # crash-free on the adversarial tables is the bar


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_edge_sweep_matches_oracle(name, edge_sf, ray_session):
    got = QUERIES[name](edge_sf)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(edge_sf, ORACLE_SQL[name])
    got, want = _normalize(got), _normalize(want)
    if len(got) == 0 and len(want) == 0:
        # an empty Ray Dataset loses its columns through to_pandas
        # (environment behavior, pinned in test_semdedup) — an empty
        # result matching an empty oracle is a pass
        return
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
