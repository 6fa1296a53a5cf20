"""Property-based fuzzing of the pure kernels (hypothesis) — beyond the
reference's example-based style: the extraction/normalization functions
must be total (never raise) and deterministic on arbitrary input."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blarify_ray.canonical import UnionFind
from blarify_ray.minhash import make_perms, shingle_codes, signature_for
from blarify_ray.text import (
    char_shingles,
    html_to_text,
    jaccard,
    normalize_surface,
    split_sentences,
)

A, B = make_perms(64)


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_html_to_text_total_and_deterministic(raw):
    out = html_to_text(raw)
    assert isinstance(out, str)
    assert out == html_to_text(raw)
    assert "<script" not in out.lower()


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_split_sentences_total(text):
    sents = split_sentences(text)
    assert all(s.strip() == s and s for s in sents)
    # no content characters are invented
    joined = "".join("".join(s.split()) for s in sents)
    original = "".join(text.split())
    assert all(ch in original for ch in set(joined))


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_surface_idempotent(s):
    n = normalize_surface(s)
    assert normalize_surface(n) == n
    assert n == n.strip().lower()


@given(st.text(alphabet="abcdefgh 0123", min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_signature_stable_and_jaccard_bounds(s):
    sig1 = signature_for(s, 3, A, B)
    sig2 = signature_for(s, 3, A, B)
    assert np.array_equal(sig1, sig2)
    codes = shingle_codes(s, 3)
    assert len(codes) == len(set(codes.tolist())) or len(codes) >= 1
    j = jaccard(char_shingles(s, 3), char_shingles(s[::-1], 3))
    assert 0.0 <= j <= 1.0


@given(
    st.lists(
        st.tuples(st.text(min_size=1, max_size=5), st.text(min_size=1, max_size=5)),
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_union_find_min_root(pairs):
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    # every root is the lexicographic minimum of its component
    comps = {}
    for node in list(uf.parent):
        comps.setdefault(uf.find(node), []).append(node)
    for root, members in comps.items():
        assert root == min(members)


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=100, deadline=None)
def test_min_label_components_equals_union_find(pairs):
    """The vectorized numpy min-label propagation (driver tier of the
    distributed canonicalize) must agree with the serial UnionFind on
    every graph: same components, same (minimum-member) labels."""
    import numpy as np

    from blarify_ray.stages.canonicalize import min_label_components

    ex = np.array([a for a, _ in pairs], dtype=np.int64)
    ey = np.array([b for _, b in pairs], dtype=np.int64)
    nodes, lab = min_label_components(ex, ey)
    got = {int(nodes[i]): int(nodes[lab[i]]) for i in range(len(nodes))}

    uf = UnionFind()
    for a, b in pairs:
        uf.union(str(a).zfill(4), str(b).zfill(4))  # zero-pad: int order == lex order
    want = {int(n): int(uf.find(str(n).zfill(4))) for n in got}
    assert got == want


# --- sketch-family and kernel properties (round-4 additions) -----------------


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=400),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=40, deadline=None)
def test_quantile_sketch_weight_exact_and_rank_bound(vals, split_seed):
    from blarify_ray.ops.sketches import QuantileSketch

    arr = np.array(vals, dtype=np.float64)
    # arbitrary split into two sketches + merge must preserve EXACT weight
    cut = (split_seed * len(arr)) // 4
    a, b = QuantileSketch(k=32), QuantileSketch(k=32)
    if cut:
        a.add(arr[:cut])
    if len(arr) - cut:
        b.add(arr[cut:])
    m = a.merge(b)
    assert m.total_weight() == len(arr)
    # quantile answers stay inside the value range and are monotone in q
    qs = [m.quantile(q) for q in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert all(arr.min() <= q <= arr.max() for q in qs)
    assert qs == sorted(qs)


@given(
    st.lists(st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=300)
)
@settings(max_examples=40, deadline=None)
def test_hll_merge_commutes_and_bounds(items):
    from blarify_ray.ops.sketches import HLL, _hash64

    h1, h2, hall = HLL(b=10), HLL(b=10), HLL(b=10)
    cut = len(items) // 2
    if items[:cut]:
        h1.add_hashes(_hash64(items[:cut]))
    if items[cut:]:
        h2.add_hashes(_hash64(items[cut:]))
    hall.add_hashes(_hash64(items))
    m12 = h1.merge(h2)
    m21 = h2.merge(h1)
    assert (m12.reg == m21.reg).all()  # merge commutes exactly
    assert (m12.reg == hall.reg).all()  # split+merge ≡ bulk (register max)
    true = len(set(items))
    assert m12.estimate() == pytest.approx(true, rel=0.25, abs=2.0)


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 50)), min_size=1, max_size=200
    )
)
@settings(max_examples=40, deadline=None)
def test_misra_gries_guarantee(pairs):
    from blarify_ray.ops.sketches import HeavyHitters

    hh = HeavyHitters(k=8)
    for w, n in pairs:
        hh.add_counts([f"w{w}"], [n])
    true: dict = {}
    for w, n in pairs:
        true[f"w{w}"] = true.get(f"w{w}", 0) + n
    n_total = sum(true.values())
    # every item above n/k survives; kept counts undercount by ≤ err
    for w, c in true.items():
        if c > n_total / 8:
            assert w in hh.counts
    for w, kept in hh.counts.items():
        assert kept <= true[w]
        assert true[w] - kept <= hh.err


@given(
    st.lists(st.text(alphabet="xyz123", min_size=1, max_size=6), min_size=1, max_size=64)
)
@settings(max_examples=30, deadline=None)
def test_hyperball_row_estimate_equals_hll(ids):
    """ops/hyperball's vectorized row-estimate and init must agree with
    the scalar HLL on the same registers — two implementations of one
    formula that must never drift."""
    from blarify_ray.ops.hyperball import _est_rows, _init_regs
    from blarify_ray.ops.sketches import HLL

    regs = _init_regs(np.array(sorted(set(ids)), dtype=object), b=8)
    merged = regs.max(axis=0)  # union of all the single-element counters
    row_est = _est_rows(merged[None, :])[0]
    assert row_est == HLL(b=8, registers=merged.astype(np.uint8)).estimate()


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40), st.integers(-50, 50)),
        min_size=1,
        max_size=300,
    ),
    st.integers(1, 6),
)
@settings(max_examples=40, deadline=None)
def test_knn_topk_rows_matches_sort(rows, k):
    from blarify_ray.ops.similarity import _topk_rows

    qids = np.array([q for q, _, _ in rows], np.int64)
    nids = np.array([n for _, n, _ in rows], np.int64)
    sims = np.array([s for _, _, s in rows], np.float64)
    q2, n2, r2, s2 = _topk_rows(qids, nids, sims, k)
    got = sorted(zip(q2, n2, r2, s2))
    want = []
    for q in sorted(set(qids)):
        cand = sorted(
            [(n, s) for qq, n, s in zip(qids, nids, sims) if qq == q],
            key=lambda t: (-t[1], t[0]),
        )[:k]
        want += [(q, n, r, s) for r, (n, s) in enumerate(cand)]
    assert got == sorted(want)


@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=200))
@settings(max_examples=40, deadline=None)
def test_round_half_away_matches_decimal(cents):
    """_round_half_away must equal decimal ROUND_HALF_UP on exact .5
    inputs of either sign — the DuckDB ROUND contract the oracle money
    columns rely on."""
    import decimal

    from blarify_ray.pipelines.analytics import _round_half_away

    v = np.array(cents, np.float64) / 2.0  # exact halves and integers
    got = _round_half_away(v)
    want = [
        int(
            decimal.Decimal(x).quantize(
                decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
            )
        )
        for x in v
    ]
    assert got.tolist() == want


def test_grouped_distinct_accuracy():
    """Grouped HLL per-key estimates vs exact distinct counts — the
    engine-side accuracy contract (Ray dataset path, not just the
    kernel)."""
    import ray.data

    from blarify_ray.ops.sketches import grouped_distinct

    rows = []
    for k, n in [("a", 500), ("b", 50), ("c", 3)]:
        rows += [{"k": k, "v": f"{k}{i % n}"} for i in range(n * 3)]
    ds = ray.data.from_items(rows)
    got = {r["k"]: r["approx_distinct"] for r in grouped_distinct(ds, "k", "v").take_all()}
    assert got["a"] == pytest.approx(500, rel=0.1)
    assert got["b"] == pytest.approx(50, rel=0.1)
    assert got["c"] == pytest.approx(3, abs=1)


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=80,
    )
)
@settings(max_examples=40, deadline=None)
def test_pii_regex_parity_python_vs_duckdb(s):
    """The PII scrub's core cross-engine contract, fuzzed: for ANY text
    (incl. unicode letters adjacent to digits — the \\b trap), Python
    re with re.ASCII and DuckDB RE2 must agree on match COUNTS and the
    fully-redacted string for all three patterns."""
    import re

    import duckdb

    from blarify_ray.pipelines.analytics_export import (
        PII_EMAIL,
        PII_IP,
        PII_PHONE,
    )

    pats = [(PII_EMAIL, "<EMAIL>"), (PII_PHONE, "<PHONE>"), (PII_IP, "<IP>")]
    py = s
    for pat, rep in pats:
        py = re.sub(re.compile(pat, re.ASCII), rep, py)
    con = duckdb.connect()
    sql_expr = "?"
    args = [s]
    for pat, rep in pats:
        sql_expr = f"regexp_replace({sql_expr}, ?, ?, 'g')"
        args += [pat, rep]
    want = con.execute(f"SELECT {sql_expr}", args).fetchone()[0]
    assert py == want
    for pat, _ in pats:
        n_py = len(re.compile(pat, re.ASCII).findall(s))
        n_sql = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [s, pat]
        ).fetchone()[0]
        assert n_py == n_sql, pat


@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=30)),
        max_size=20,
    ),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=60, deadline=None)
def test_hash_features_csr_invariants(texts, dim):
    """Hashed-BoW CSR: offsets are a monotone prefix sum of whitespace
    token counts (null → 0), every index < dim, and the mapping is
    deterministic and independent of surrounding rows."""
    import pandas as pd_

    from blarify_ray.ops.classifier import hash_features

    idx, off = hash_features(pd_.Series(texts, dtype=object), dim)
    assert len(off) == len(texts) + 1 and off[0] == 0
    assert (off[1:] >= off[:-1]).all()
    counts = [len((t or "").split()) for t in texts]
    assert (off[1:] - off[:-1]).tolist() == counts
    assert len(idx) == sum(counts)
    assert (idx < dim).all() and (idx >= 0).all()
    idx2, off2 = hash_features(pd_.Series(texts, dtype=object), dim)
    assert (idx2 == idx).all() and (off2 == off).all()
    # row-local: a row's slice is unchanged when scored alone
    for i, t in enumerate(texts):
        lone_idx, _ = hash_features(pd_.Series([t], dtype=object), dim)
        assert (lone_idx == idx[off[i] : off[i + 1]]).all()


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=60))
@settings(max_examples=40, deadline=None)
def test_single_space_split_parity_python_vs_duckdb(s):
    """Block dedup's tokenization contract: Python str.split(' ') and
    DuckDB string_split(x, ' ') must agree exactly (consecutive spaces
    produce empty tokens on BOTH sides — unlike whitespace split)."""
    import duckdb

    py = s.split(" ")
    got = duckdb.connect().execute("SELECT string_split(?, ' ')", [s]).fetchone()[0]
    assert got == py
