"""Property-based fuzzing of the pure kernels (hypothesis) — beyond the
reference's example-based style: the extraction/normalization functions
must be total (never raise) and deterministic on arbitrary input."""

import numpy as np
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
