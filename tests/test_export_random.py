"""Randomized-input invariants for the round-4 export battery and the
PQ/IVF-PQ search path.

The sf0.001 oracle sweep checks these queries once on the driver's
synthetic corpus; these tests re-check them on seeded RANDOM tables
shaped to hit the paths that corpus never exercises — doc_ids beyond
2^32 (the uint64-wraparound contract of the shuffle key), overlapping
duplicated spans and within-single-doc gram repeats (the
COUNT(DISTINCT doc_id) >= 2 rule), snippet donors with empty text —
always against the SAME DuckDB SQL the driver runs. The PQ tests check
algebraic identities instead: ADC is EXACTLY the cosine against the
reconstructed vector, and a full-probe full-rerank IVF-PQ search must
degrade to exact brute force.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from blarify_ray.ops.similarity import (
    IvfIndex,
    PqCodebook,
    _unit,
    knn_bruteforce,
    search_ivfpq,
    write_ivfpq,
)
from blarify_ray.pipelines.analytics_export import (
    EXPORT_SHARD_DOCS,
    ORACLE_SQL_EXPORT,
    QUERIES_EXPORT,
    SPAN_RM_TOKENS,
)


def _write_docs(tmp_path, ids, texts):
    tbl = pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def _oracle(tmp_path, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------- shuffle plan


def test_shuffle_shards_huge_sparse_ids(tmp_path, ray_session):
    """doc_ids far beyond 2^32: the engine's uint64 modular hash must
    equal DuckDB's exact HUGEINT arithmetic, and the plan must be a
    permutation cut into full shards."""
    rng = np.random.RandomState(41)
    small = rng.randint(0, 10_000, size=300)
    huge = rng.randint(2**33, 2**62, size=300)
    ids = np.unique(np.concatenate([small, huge]).astype(np.int64))
    _write_docs(tmp_path, ids, ["x"] * len(ids))

    got = QUERIES_EXPORT["shuffle_shards_docs"](str(tmp_path)).to_pandas()
    want = _oracle(tmp_path, ORACLE_SQL_EXPORT["shuffle_shards_docs"])
    _cmp(got, want)

    # invariants: pos is exactly 0..n-1; shards are full except the last
    pos = np.sort(got["pos"].to_numpy(np.int64))
    assert (pos == np.arange(len(ids))).all()
    sizes = got.groupby("shard_id").size()
    assert (sizes.iloc[:-1] == EXPORT_SHARD_DOCS).all() if len(sizes) > 1 else True
    assert (got["shard_id"].to_numpy() == got["pos"].to_numpy() // EXPORT_SHARD_DOCS).all()


# ---------------------------------------------------------------- span removal


def _random_span_corpus(seed: int, n_docs: int):
    """Small-alphabet corpora that FORCE overlap/within-doc edge cases:
    duplicated 8-token spans shared across docs (some overlapping at
    distance < n_tokens), a long run repeated only WITHIN one doc
    (must survive — the distinct-doc rule), and short docs below the
    window size."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(12)]
    shared = [vocab[rng.randint(len(vocab))] for _ in range(SPAN_RM_TOKENS + 3)]
    texts, ids = [], []
    for d in range(n_docs):
        n = int(rng.randint(0, 30))
        toks = [vocab[rng.randint(len(vocab))] for _ in range(n)]
        if d % 3 == 0:
            at = int(rng.randint(0, len(toks) + 1))
            toks[at:at] = shared  # cross-doc duplicate (overlapping windows)
        if d % 5 == 1:
            run = [vocab[0]] * (SPAN_RM_TOKENS + 2)
            toks += run + ["sep"] + run  # within-doc repeat only
        ids.append(d * 7 + 1)
        texts.append(" ".join(toks))
    return ids, texts


def test_span_removal_random_overlaps(tmp_path, ray_session):
    ids, texts = _random_span_corpus(97, 24)
    _write_docs(tmp_path, ids, texts)
    got = QUERIES_EXPORT["span_removed_docs"](str(tmp_path)).to_pandas()
    want = _oracle(tmp_path, ORACLE_SQL_EXPORT["span_removed_docs"])
    got, want = _norm(got), _norm(want)
    want["n_removed"] = want["n_removed"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # the planted cross-doc spans must actually trigger removals
    assert (got["n_removed"] > 0).any()


def test_span_removal_every_doc_identical(tmp_path, ray_session):
    """All docs identical: only the first (lowest doc_id) keeps its
    text; every other doc is fully excised (token count < 2*window so
    every position is covered by some duplicated window)."""
    text = " ".join(f"t{i}" for i in range(SPAN_RM_TOKENS + 4))
    ids = [5, 9, 2, 14]
    _write_docs(tmp_path, ids, [text] * 4)
    got = QUERIES_EXPORT["span_removed_docs"](str(tmp_path)).to_pandas()
    want = _oracle(tmp_path, ORACLE_SQL_EXPORT["span_removed_docs"])
    got, want = _norm(got), _norm(want)
    want["n_removed"] = want["n_removed"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    by = got.set_index("doc_id")
    assert by.loc[2, "text_clean"] == text  # global first occurrence wins
    assert (by.drop(index=2)["text_clean"] == "").all()


def test_block_dedup_random(tmp_path, ray_session):
    """Random corpora hitting block-dedup edges: within-doc repeated
    blocks (removed — unlike span removal's distinct-doc rule), null
    and empty texts (one '' block; only the first survives), partial
    tail blocks, sparse huge doc_ids."""
    from blarify_ray.pipelines.analytics_export import BLOCK_TOKENS

    rng = np.random.RandomState(71)
    vocab = [f"b{i}" for i in range(9)]
    block = " ".join(vocab[:BLOCK_TOKENS])
    ids, texts = [], []
    for d in range(40):
        ids.append(int(d * 101 + (d % 7 == 0) * 2**34))
        if d % 11 == 0:
            texts.append(None)  # null text → one '' block on both sides
        elif d % 7 == 3:
            texts.append(block + " " + block)  # within-doc repeat
        else:
            n = int(rng.randint(0, 4 * BLOCK_TOKENS))  # partial tails
            texts.append(" ".join(vocab[rng.randint(len(vocab))] for _ in range(n)))
    tbl = pa.Table.from_pydict(
        {"doc_id": pa.array(np.array(ids, np.int64)), "text": pa.array(texts, pa.string())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    from blarify_ray.pipelines.analytics_export import SQL_BLOCK_DEDUP, q_block_dedup_docs

    got = _norm(q_block_dedup_docs(str(tmp_path)).to_pandas())
    want = _norm(_oracle(tmp_path, SQL_BLOCK_DEDUP))
    for c in ("n_blocks", "n_removed"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # the planted within-doc repeat must lose its second block
    rep = got[got["doc_id"] == 3 * 101]
    assert int(rep["n_removed"].iloc[0]) >= 1


# ---------------------------------------------------------- fuzzy decontamination


def test_fuzzy_contamination_random(tmp_path, ray_session):
    """Random corpus where every FUZZY_MOD-th doc donates a snippet;
    includes donors with empty/whitespace text (zero-token snippets
    must match nothing) and near-miss docs just under the threshold."""
    rng = np.random.RandomState(13)
    vocab = [f"v{i}" for i in range(40)]
    ids, texts = [], []
    # ids unique by construction: d*41 (donor) or d*41 + r, r in [1,41)
    for d in range(0, 120):
        did = d * 41 if d % 4 == 0 else d * 41 + int(rng.randint(1, 41))
        toks = [vocab[rng.randint(len(vocab))] for _ in range(int(rng.randint(0, 25)))]
        ids.append(did)
        texts.append(" ".join(toks) if d % 9 else "  ")
    _write_docs(tmp_path, np.array(ids, np.int64), texts)

    got = QUERIES_EXPORT["fuzzy_contamination"](str(tmp_path)).to_pandas()
    want = _oracle(tmp_path, ORACLE_SQL_EXPORT["fuzzy_contamination"])
    _cmp(got.drop(columns=["containment"]), want.drop(columns=["containment"]))
    # thresholds hold exactly in integer arithmetic on the engine side
    assert (got["containment"] >= 0.8 - 1e-12).all()


def test_write_training_shards_roundtrip_and_resume(tmp_path, ray_session):
    """Shard layout == plan exactly (every doc once, in its planned
    shard, text intact); rerun skips via the fingerprint marker; a
    touched input invalidates and rewrites."""
    import glob
    import os
    import time

    import duckdb as _duckdb

    ids = np.arange(0, 3700, 7, dtype=np.int64)  # sparse, several shards
    texts = [f"doc {i} body" for i in ids]
    _write_docs(tmp_path, ids, texts)

    from blarify_ray.pipelines.analytics_export import (
        ORACLE_SQL_EXPORT,
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    meta = write_training_shards(str(tmp_path), out)
    assert not meta["skipped"] and meta["n_shards"] >= 5

    files = glob.glob(os.path.join(out, "shard_id=*", "*.parquet"))
    got = _duckdb.sql(
        f"SELECT doc_id, pos, CAST(shard_id AS BIGINT) AS shard_id, text "
        f"FROM read_parquet({files!r}, hive_partitioning=1)"
    ).df()
    assert len(got) == len(ids)
    want = _oracle(tmp_path, ORACLE_SQL_EXPORT["shuffle_shards_docs"])
    m = got.merge(want, on="doc_id", suffixes=("", "_plan"))
    assert (m["shard_id"] == m["shard_id_plan"]).all()
    assert (m["pos"] == m["pos_plan"]).all()
    assert (m["text"] == m["doc_id"].map(lambda i: f"doc {i} body")).all()

    # identical input → skip; touched input → rewrite
    again = write_training_shards(str(tmp_path), out)
    assert again["skipped"]
    time.sleep(0.02)
    os.utime(str(tmp_path / "documents.parquet"))
    third = write_training_shards(str(tmp_path), out)
    assert not third["skipped"] and third["n_shards"] == meta["n_shards"]


# ------------------------------------------------------------------ PII redact


def test_pii_redact_planted(tmp_path, ray_session):
    """Planted emails/phones/IPs (the synthetic corpus has none) plus
    the parity traps: unicode letters adjacent to digits (\\b must be
    ASCII on both sides), an email whose tail looks like a phone, a
    >255 dotted quad (still redacted — the pattern is syntactic),
    nulls, and a 4-dash number that must NOT match."""
    rng = np.random.RandomState(5)
    cases = [
        "contact me at alice.smith+x@example.co.uk today",
        "call 555-123-4567 or 555-123-4567 twice",
        "server at 10.0.255.300 and 1.2.3.4",
        "émile123-456-7890 unicode-boundary trap",
        "not-a-phone 1234-567-8901 four leading digits",
        "bob@mail.org 192.168.0.1 777-888-9999 all three",
        None,
        "",
        "plain words only",
    ]
    ids = list(range(len(cases))) + [100 + i for i in range(20)]
    vocab = ["w%d" % i for i in range(10)]
    texts = cases + [
        " ".join(vocab[rng.randint(10)] for _ in range(rng.randint(0, 15)))
        for _ in range(20)
    ]
    tbl = pa.Table.from_pydict(
        {"doc_id": pa.array(np.array(ids, np.int64)), "text": pa.array(texts, pa.string())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    from blarify_ray.pipelines.analytics_export import SQL_PII_REDACT, q_pii_redact_docs

    got = _norm(q_pii_redact_docs(str(tmp_path)).to_pandas())
    want = _norm(_oracle(tmp_path, SQL_PII_REDACT))
    for c in ("n_emails", "n_phones", "n_ips"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    by = got.set_index("doc_id")
    assert by.loc[0, "n_emails"] == 1 and "<EMAIL>" in by.loc[0, "text_redacted"]
    assert by.loc[1, "n_phones"] == 2
    assert by.loc[5, ["n_emails", "n_phones", "n_ips"]].tolist() == [1, 1, 1]
    assert by.loc[8, "text_redacted"] == "plain words only"


# ---------------------------------------------------------------- PQ / IVF-PQ


def _rand_vectors(seed: int, n: int, d: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n, d).astype(np.float64)


def _vec_ds(vecs: np.ndarray):
    import ray

    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float64()), vecs.shape[1]
                ),
            }
        )
    )


def test_pq_adc_is_exact_cosine_of_reconstruction(ray_session):
    """ADC identity: Σ_m q_sub·codebook[m, code_m] IS the cosine of q
    against the codebook-reconstructed vector — exact, not approximate.
    Checked for every corpus vector by asking for k = n."""
    vecs = _rand_vectors(3, 64, 16)
    ds = _vec_ds(vecs)
    pqc = PqCodebook.train(ds, m=4, n_codes=16, sample_n=64, iters=4, seed=5)
    codes_rows = pqc.encode(ds).take_all()
    codes = {r["id"]: np.asarray(r["code"], np.int64) for r in codes_rows}
    q = _unit(_rand_vectors(8, 1, 16)[0])

    got = dict(pqc.search(pqc.encode(ds), q, k=len(vecs)))
    for vid, code in codes.items():
        recon = np.concatenate([pqc.codebooks[s, code[s]] for s in range(pqc.m)])
        assert abs(got[vid] - float(q @ recon)) < 1e-9


def test_ivfpq_full_probe_full_rerank_equals_bruteforce(tmp_path, ray_session):
    """With nprobe = all centroids and rerank covering the corpus, the
    IVF-PQ path must return EXACTLY the brute-force exact top-k — the
    quantization error is fully cancelled by the refine step."""
    vecs = _rand_vectors(7, 120, 16)
    ds = _vec_ds(vecs)
    ivf = IvfIndex.train(ds, n_centroids=4, sample_n=120, iters=4, seed=9)
    pqc = PqCodebook.train(ds, m=4, n_codes=16, sample_n=120, iters=4, seed=9)
    layout = str(tmp_path / "ivfpq")
    write_ivfpq(ivf, pqc, ds, layout)

    q = _rand_vectors(20, 1, 16)[0]
    got = search_ivfpq(ivf, pqc, layout, q, k=5, nprobe=4, rerank=120)
    want = knn_bruteforce(ds, _unit(q)[None, :], 5)[0]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


def test_ivfpq_partial_probe_subset_of_probed_cells(tmp_path, ray_session):
    """nprobe=1 results come only from vectors assigned to the probed
    centroid — the layout prune is semantic, not just an I/O trick."""
    vecs = _rand_vectors(11, 90, 16)
    ds = _vec_ds(vecs)
    ivf = IvfIndex.train(ds, n_centroids=3, sample_n=90, iters=4, seed=2)
    pqc = PqCodebook.train(ds, m=4, n_codes=16, sample_n=90, iters=4, seed=2)
    layout = str(tmp_path / "ivfpq")
    write_ivfpq(ivf, pqc, ds, layout)

    q = _rand_vectors(30, 1, 16)[0]
    probe = ivf._probe_ids(_unit(q), 1)[0]
    assigned = np.argmax(_unit(vecs) @ ivf.centroids.T, axis=1)
    allowed = set(np.where(assigned == probe)[0].tolist())
    got = search_ivfpq(ivf, pqc, layout, q, k=5, nprobe=1, rerank=10)
    assert got and all(i in allowed for i, _ in got)


def test_negative_samples_sparse_part_keys(tmp_path, ray_session):
    """Sparse part keys spanning a huge range (bucket width >> 1, long
    empty bucket runs) plus orders whose positives cover MOST of the
    part universe (high collision rate) — compared against the SQL
    sampler exactly."""
    rng = np.random.RandomState(61)
    pkeys = np.unique(rng.randint(0, 40_000_000, size=60).astype(np.int64))
    pq.write_table(
        pa.Table.from_pydict({"p_partkey": pa.array(pkeys, pa.int64())}),
        str(tmp_path / "part.parquet"),
    )
    orders, parts = [], []
    for o in range(25):
        # order 0 buys almost everything → its proposals mostly collide
        n = len(pkeys) - 2 if o == 0 else int(rng.randint(1, 6))
        chosen = rng.choice(pkeys, size=n, replace=False)
        orders.extend([o] * n)
        parts.extend(chosen.tolist())
    pq.write_table(
        pa.Table.from_pydict(
            {"l_orderkey": pa.array(orders, pa.int64()),
             "l_partkey": pa.array(parts, pa.int64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )

    import duckdb as _d

    from blarify_ray.pipelines.analytics_export import (
        ORACLE_SQL_EXPORT,
        QUERIES_EXPORT,
    )

    got = QUERIES_EXPORT["negative_samples"](str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    con = _d.connect()
    for t in ("lineitem", "part"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    want = con.sql(ORACLE_SQL_EXPORT["negative_samples"]).df()
    want = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # the saturated order must actually exercise the collision-drop path
    n_pos_0 = len(pkeys) - 2
    emitted_0 = (got["l_orderkey"] == 0).sum()
    assert emitted_0 < 2 * n_pos_0  # at least one proposal collided
    # negatives are always real parts, never the positive itself at j-row level
    assert set(got["neg_part"]).issubset(set(pkeys.tolist()))


def test_negative_samples_overflow_zone_partkeys(tmp_path, ray_session):
    """Partkeys and orderkeys pushing the wrapped hash base past
    ~3.47e9, where an uncast BIGINT multiply by 2654435761 overflows
    int64 in DuckDB — the oracle must use HUGEINT for the multiply and
    agree with the engine's uint64 math (regression for the SQL cast)."""
    pkeys = np.array([1, 4_000_000_000, 4_294_967_290, 2**40, 2**55], np.int64)
    pq.write_table(
        pa.Table.from_pydict({"p_partkey": pa.array(pkeys, pa.int64())}),
        str(tmp_path / "part.parquet"),
    )
    # (o, p) combos chosen so (o*31 + p + j*97) % 2^32 lands high
    orders = np.array([1, 138_547_000, 3, 7], np.int64)
    parts = np.array([4_000_000_000, 1, 2**40, 4_294_967_290], np.int64)
    pq.write_table(
        pa.Table.from_pydict(
            {"l_orderkey": pa.array(orders), "l_partkey": pa.array(parts)}
        ),
        str(tmp_path / "lineitem.parquet"),
    )

    import duckdb as _d

    got = QUERIES_EXPORT["negative_samples"](str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    con = _d.connect()
    for t in ("lineitem", "part"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    want = con.sql(ORACLE_SQL_EXPORT["negative_samples"]).df()
    want = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_negative_samples_empty_part_table(tmp_path, ray_session):
    """An empty part table must degrade to the empty result (the SQL's
    join against an empty rank table), never ValueError on an empty
    batch partial."""
    pq.write_table(
        pa.Table.from_pydict({"p_partkey": pa.array([], pa.int64())}),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.Table.from_pydict(
            {"l_orderkey": pa.array([1, 2], pa.int64()),
             "l_partkey": pa.array([3, 4], pa.int64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = QUERIES_EXPORT["negative_samples"](str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 0
    assert sorted(got.columns) == ["j", "l_orderkey", "neg_part", "pos_part"]
