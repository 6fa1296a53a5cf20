"""Query layer + incremental update over a small built KG."""

import shutil

import pytest

from blarify_ray.corpus import gen_page_rows, page_url
from blarify_ray.pipelines.graph_queries import (
    entry_points,
    find_entities,
    k_hop,
    node_detail,
    skeleton,
    top_entities,
)
from blarify_ray.pipelines.incremental import incremental_update
from blarify_ray.pipelines.kg_build import build_kg, triples_table
from blarify_ray.serial import run_serial

N = 60
OUT = "/tmp/blarify_ray_test_gq"


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, N)


def _entities(paths):
    from blarify_ray.state.manifest import read_stage

    return read_stage(paths["entities"]).take_all()


def test_node_detail_and_pruning(built):
    ents = _entities(built)
    # pick an entity that is a subject of some edge
    from blarify_ray.state.manifest import read_stage

    edge = read_stage(built["edges"]).take(1)[0]
    d = node_detail(built, edge["src_id"])
    assert d["entity"] is not None
    assert any(e["dst_id"] == edge["dst_id"] for e in d["outbound"])
    missing = node_detail(built, "0" * 32)
    assert missing["entity"] is None and missing["outbound"] == []


def test_find_entities(built):
    hits = find_entities(built, "Data").take_all()
    assert hits and all(
        "Data" in h["name"] or any("Data" in a for a in h["aliases"]) for h in hits
    )


def test_k_hop_depths(built):
    from blarify_ray.state.manifest import read_stage

    edge = read_stage(built["edges"]).take(1)[0]
    res = {r["entity_id"]: r["depth"] for r in k_hop(built, [edge["src_id"]], max_depth=2).take_all()}
    assert res[edge["src_id"]] == 0
    assert res[edge["dst_id"]] == 1
    assert all(d <= 2 for d in res.values())


def test_entry_points_anti_join(built):
    from blarify_ray.state.manifest import read_stage

    eps = {r["src_id"] for r in entry_points(built).take_all()}
    dsts = {r["dst_id"] for r in read_stage(built["edges"]).take_all()}
    assert eps and not (eps & dsts)


def test_top_entities_and_skeleton(built):
    top = top_entities(built, k=5).take_all()
    assert len(top) == 5
    assert top[0]["n_mentions"] == max(r["n_mentions"] for r in _entities(built))
    sk = skeleton(built).take_all()
    assert sk and all(r["n_edges"] >= 1 for r in sk)
    assert any(r["pred"] == "FOUNDED_BY" for r in sk)


def test_doc_context(built):
    from blarify_ray.pipelines.graph_queries import doc_context
    from blarify_ray.state.manifest import read_stage

    some_url = read_stage(built["mentions"]).take(1)[0]["url"]
    ctx = doc_context(built, some_url)
    assert ctx["doc"] is not None and ctx["doc"]["url"] == some_url
    assert ctx["mentions"]
    assert all(m["url"] == some_url for m in ctx["mentions"])
    missing = doc_context(built, "https://nope.example/x")
    assert missing["doc"] is None and missing["mentions"] == []


def test_workflows_dfs_lcp(built):
    from blarify_ray.pipelines.graph_queries import workflows
    from blarify_ray.state.manifest import read_stage

    rows = workflows(built, max_depth=4).take_all()
    assert rows
    edge_set = {
        (e["src_id"], e["pred"], e["dst_id"])
        for e in read_stage(built["edges"]).take_all()
    }
    # every emitted step is a real edge
    assert all((r["src_id"], r["pred"], r["dst_id"]) in edge_set for r in rows)
    # entry nodes have no incoming edges
    dsts = {e[2] for e in edge_set}
    assert all(r["entry_id"] not in dsts for r in rows)
    # LCP dedup: within an entry, (path_id, step) rows are unique and a
    # later path never re-emits step 0..k it shares with its predecessor
    seen = set()
    for r in rows:
        key = (r["entry_id"], r["path_id"], r["step"])
        assert key not in seen
        seen.add(key)
    # deterministic across calls
    rows2 = workflows(built, max_depth=4).take_all()
    assert rows == rows2


def test_workflows_forced_distributed_tier(built):
    """The frontier-join DFS tier (edges above workflows_driver_max_edges)
    must produce rows identical to the driver DFS — unpaged, paged, and
    pred-filtered."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG
    from blarify_ray.pipelines.graph_queries import workflows

    forced = dataclasses.replace(DEFAULT_CONFIG, workflows_driver_max_edges=0)

    def key(r):
        return (r["entry_id"], r["path_id"], r["step"])

    want = sorted(workflows(built, max_depth=4).take_all(), key=key)
    got = sorted(workflows(built, max_depth=4, cfg=forced).take_all(), key=key)
    assert got == want

    # paging concatenation: large pages reproduce the unpaged rows (each
    # page is a full distributed DFS at 4 CPUs, so keep the page count low)
    n_units = len({(r["entry_id"], r["path_id"]) for r in want})
    page_sz = max(1, n_units // 2 + 1)  # → 2 pages + 1 empty probe
    paged = []
    off = 0
    while True:
        page = workflows(
            built, max_depth=4, offset=off, limit=page_sz, cfg=forced
        ).take_all()
        if not page:
            break
        paged.extend(page)
        off += page_sz
    assert sorted(paged, key=key) == want

    # pred filter parity
    want_f = sorted(
        workflows(built, max_depth=4, preds=["FOUNDED_BY"]).take_all(), key=key
    )
    got_f = sorted(
        workflows(built, max_depth=4, preds=["FOUNDED_BY"], cfg=forced).take_all(),
        key=key,
    )
    assert got_f == want_f


def test_k_hop_forced_distributed_tier(built):
    """Frontier over khop_broadcast_max → dataset semi-join tier; rows
    (including minimal depths and paging) must match the broadcast tier."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG
    from blarify_ray.pipelines.graph_queries import top_entities

    forced = dataclasses.replace(DEFAULT_CONFIG, khop_broadcast_max=0)
    seed = top_entities(built, k=1).take_all()[0]["entity_id"]

    def key(r):
        return (r["depth"], r["entity_id"])

    want = sorted(k_hop(built, [seed], max_depth=3).take_all(), key=key)
    got = sorted(k_hop(built, [seed], max_depth=3, cfg=forced).take_all(), key=key)
    assert [(r["entity_id"], r["depth"]) for r in got] == [
        (r["entity_id"], r["depth"]) for r in want
    ]
    assert len(want) > 1

    # paged distributed call matches the broadcast tier's page
    page_b = k_hop(built, [seed], max_depth=3, offset=2, limit=5).take_all()
    page_d = k_hop(built, [seed], max_depth=3, offset=2, limit=5, cfg=forced).take_all()
    assert [(r["entity_id"], r["depth"]) for r in page_d] == [
        (r["entity_id"], r["depth"]) for r in page_b
    ]


def test_node_detail_inbound_index_matches_scan(built):
    """The dst-bucketed inbound index returns exactly the rows the
    full-table fallback scan returns (bucket column restored to the
    canonical src bucket)."""
    from blarify_ray.pipelines.graph_queries import node_detail
    from blarify_ray.state.manifest import read_stage

    edge = read_stage(built["edges"]).take(1)[0]
    eid = edge["dst_id"]
    assert "edges_by_dst" in built
    with_index = node_detail(built, eid)
    no_index = node_detail(
        {k: v for k, v in built.items() if k != "edges_by_dst"}, eid
    )

    def key(r):
        return (r["src_id"], r["pred"], r["dst_id"])

    assert with_index["inbound"]
    assert sorted(with_index["inbound"], key=key) == sorted(
        no_index["inbound"], key=key
    )


def test_incremental_noop_identity(built):
    """Re-crawling pages with identical content must leave every table
    byte-identical (idempotent MERGE analog)."""
    from blarify_ray.state.manifest import read_stage

    before = {
        (e["src_id"], e["dst_id"], e["pred"], e["weight"])
        for e in read_stage(built["edges"]).take_all()
    }
    paths = incremental_update(OUT, N, [3, 9, 12])
    after = {
        (e["src_id"], e["dst_id"], e["pred"], e["weight"])
        for e in read_stage(paths["edges"]).take_all()
    }
    assert before == after


def test_incremental_content_change_matches_serial():
    """Changed content for a subset → the updated KG must equal a serial
    golden over the mixed corpus (changed pages from the new seed)."""
    out = OUT + "_chg"
    shutil.rmtree(out, ignore_errors=True)
    build_kg(out, N)
    changed = [6, 20]  # avoid i%61==5 (RAW lang page: never emits triples)
    paths = incremental_update(out, N, changed, content_seed=99)

    rows = []
    for i in range(N):
        rows.extend(gen_page_rows(i, N, seed=99 if i in changed else 42))
    ser = run_serial(rows, N)

    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples_table(paths).take_all()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"]) for t in ser["triples"]
    }
    assert got == want
    # sanity: the changed urls actually contribute different triples now
    assert any(r[0] == page_url(6) for r in got)
