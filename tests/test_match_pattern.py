"""Declarative pattern matching: exact comparison against an independent
brute-force binding enumerator on the built KG, forced-tier parity
(driver pandas merges vs co-partitioned fan-out joins must produce
identical rows), paging exactness (pages concatenate to the unpaged
result), and constraint semantics (pred / dst_type / src_type /
distinct_nodes)."""

import dataclasses
import itertools
import shutil

import pytest

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.pipelines.graph_queries import match_pattern
from blarify_ray.pipelines.kg_build import build_kg
from blarify_ray.state.manifest import read_stage

N = 50
OUT = "/tmp/blarify_ray_test_mp"

FORCED = dataclasses.replace(DEFAULT_CONFIG, workflows_driver_max_edges=0)


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, N)


@pytest.fixture(scope="module")
def graph(built):
    ents = {
        r["entity_id"]: r["type"]
        for r in read_stage(built["entities"], columns=["entity_id", "type"]).take_all()
    }
    triples = sorted(
        {
            (r["src_id"], r["pred"], r["dst_id"])
            for r in read_stage(
                built["edges"], columns=["src_id", "dst_id", "pred"]
            ).take_all()
        }
    )
    return ents, triples


def _brute(ents, triples, steps, src_type=None, start_ids=None, distinct=False):
    """Independent reference: enumerate bindings by nested loops."""
    starts = set(ents) if start_ids is None else set(start_ids) & set(ents)
    if src_type is not None:
        starts = {e for e in starts if ents[e] == src_type}
    rows = [(s,) for s in sorted(starts)]
    for step in steps:
        nxt = []
        for row in rows:
            for s, p, d in triples:
                if s != row[-1]:
                    continue
                if step.get("pred") is not None and p != step["pred"]:
                    continue
                if step.get("dst_type") is not None and ents.get(d) != step["dst_type"]:
                    continue
                nxt.append(row + (p, d))
        rows = nxt
    if distinct:
        rows = [r for r in rows if len(set(r[0::2])) == len(r[0::2])]
    return sorted(rows)


def _rows(ds):
    out = []
    for r in ds.take_all():
        k = (len(r) - 1) // 2
        t = [r["n0"]]
        for i in range(1, k + 1):
            t += [r[f"p{i}"], r[f"n{i}"]]
        out.append(tuple(t))
    return out


def test_two_hop_matches_bruteforce(built, graph):
    ents, triples = graph
    steps = [{}, {}]
    got = _rows(match_pattern(built, steps, limit=None))
    want = _brute(ents, triples, steps)
    assert got == want
    assert len(got) > 0


def test_pred_and_type_constraints(built, graph):
    ents, triples = graph
    # pick the most common predicate and a real entity type so the
    # constrained pattern is non-empty
    preds = [p for _, p, _ in triples]
    pred = max(set(preds), key=preds.count)
    dst_type = ents[next(d for s, p, d in triples if p == pred)]
    steps = [{"pred": pred, "dst_type": dst_type}]
    got = _rows(match_pattern(built, steps, limit=None))
    want = _brute(ents, triples, steps)
    assert got == want
    assert len(got) > 0
    assert all(ents[r[2]] == dst_type for r in got)
    # src_type narrows the start set
    src_type = ents[want[0][0]]
    got2 = _rows(match_pattern(built, steps, src_type=src_type, limit=None))
    assert got2 == _brute(ents, triples, steps, src_type=src_type)


def test_forced_tier_parity_and_distinct(built, graph):
    ents, triples = graph
    steps = [{}, {}]
    a = _rows(match_pattern(built, steps, distinct_nodes=True, limit=None))
    b = _rows(match_pattern(built, steps, distinct_nodes=True, limit=None, cfg=FORCED))
    assert a == b
    assert a == _brute(ents, triples, steps, distinct=True)


def test_paging_concatenates_exactly(built):
    steps = [{}, {}]
    full = _rows(match_pattern(built, steps, limit=None))
    paged = list(
        itertools.chain.from_iterable(
            _rows(match_pattern(built, steps, offset=o, limit=7))
            for o in range(0, len(full) + 7, 7)
        )
    )
    assert paged == full
    # forced-tier paging agrees too
    assert _rows(match_pattern(built, steps, offset=7, limit=7, cfg=FORCED)) == full[7:14]


def test_start_ids_and_empty(built, graph):
    ents, triples = graph
    seed = triples[0][0]
    got = _rows(match_pattern(built, [{}], start_ids=[seed], limit=None))
    assert got == _brute(ents, triples, [{}], start_ids=[seed])
    assert len(got) > 0
    # nonexistent predicate → empty result with the right arity
    empty = match_pattern(built, [{"pred": "no_such_pred"}, {}], limit=None)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"n0", "p1", "n1", "p2", "n2"}


def test_reverse_step_direction(built, graph):
    """dir:'in' binds the reversed edge: (a)<-[p]-(b) rows must equal
    the forward pattern on the transposed triple set."""
    ents, triples = graph
    rev_triples = sorted({(d, p, s) for s, p, d in triples})
    got = _rows(match_pattern(built, [{"dir": "in"}], limit=None))
    want = _brute(ents, rev_triples, [{}])
    assert got == want and len(got) > 0
    # mixed directions: out then in — forced-tier parity too
    steps = [{}, {"dir": "in"}]
    a = _rows(match_pattern(built, steps, limit=None))
    b = _rows(match_pattern(built, steps, limit=None, cfg=FORCED))
    assert a == b and len(a) > 0
    # brute: second hop over reversed triples
    by_first = _brute(ents, triples, [{}])
    want2 = sorted(
        row + (p, d)
        for row in by_first
        for s, p, d in rev_triples
        if s == row[-1]
    )
    assert a == want2


def test_k_hop_direction(built, graph):
    from blarify_ray.pipelines.graph_queries import k_hop

    ents, triples = graph
    seed = triples[0][2]  # some dst — has at least one inbound edge
    inbound = {r["entity_id"] for r in k_hop(built, [seed], max_depth=1, direction="in").take_all()}
    want_in = {seed} | {s for s, _, d in triples if d == seed}
    assert inbound == want_in
    both = {r["entity_id"] for r in k_hop(built, [seed], max_depth=1, direction="both").take_all()}
    want_both = want_in | {d for s, _, d in triples if s == seed}
    assert both == want_both
    with pytest.raises(ValueError):
        k_hop(built, [seed], direction="sideways")


def test_invalid_dir_rejected(built):
    with pytest.raises(ValueError):
        match_pattern(built, [{"dir": "both"}], limit=5)
    with pytest.raises(ValueError):
        match_pattern(built, [{"dir": "OUT"}], limit=5)
