"""Hybrid search ranking, traversal pagination, the agent-tool registry
(+ MCP stdio loop) and the most-specific-range join."""

import io
import json
import shutil

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from blarify_ray.pipelines.doc_layer import doc_search_hybrid
from blarify_ray.pipelines.graph_queries import k_hop, top_entities, workflows
from blarify_ray.pipelines.kg_build import build_kg

N = 60
OUT = "/tmp/blarify_ray_test_tools"


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, N)


def test_hybrid_keyword_outranks_weak_vector(built):
    """A query made of an entity's NAME tokens must rank that entity
    first via the keyword component — the stub hash embedding gives
    near-random cosine, so a vector-only ranking would not guarantee
    it (queries.py:2322-2356 blended-scoring behavior)."""
    target = top_entities(built, k=5).take_all()[0]["name"]
    hits = doc_search_hybrid(built, target, k=10_000).take_all()
    assert {"score", "vector_score", "keyword_score"} <= set(hits[0])
    (trow,) = [h for h in hits if h["name"] == target]
    assert trow["keyword_score"] == 1.0  # every query term hits the name

    hyb_rank = sorted(hits, key=lambda h: (-h["score"], h["entity_id"])).index(trow)
    vec_rank = sorted(hits, key=lambda h: (-h["vector_score"], h["entity_id"])).index(trow)
    # the stub hash embedding gives the target a near-random cosine, so
    # vector-only ranking buries it; the keyword component must lift it
    # past rows with strictly higher vector score (blended scoring,
    # queries.py:2322-2356)
    assert hyb_rank < vec_rank
    outranked = [
        h for h in hits
        if h["vector_score"] > trow["vector_score"] and h["score"] < trow["score"]
    ]
    assert outranked  # a keyword-only match beat at least one stronger vector match


def test_workflows_pagination_concatenates_to_unpaged(built):
    full = workflows(built, max_depth=4).take_all()
    paged = []
    page, off = 7, 0
    while True:
        rows = workflows(built, max_depth=4, offset=off, limit=page).take_all()
        if not rows:
            break
        paged.extend(rows)
        off += page
    assert paged == full


def test_k_hop_pagination_concatenates_to_unpaged(built):
    seed = top_entities(built, k=1).take_all()[0]["entity_id"]
    full = k_hop(built, [seed], max_depth=3).take_all()
    paged = []
    off = 0
    while True:
        rows = k_hop(built, [seed], max_depth=3, offset=off, limit=5).take_all()
        if not rows:
            break
        paged.extend(rows)
        off += 5
    assert paged == full


def test_tool_registry_and_calls(built):
    from blarify_ray.tools import TOOLS, call_tool, list_tools

    specs = list_tools()
    assert len(specs) >= 11  # the reference exposes 11 tools
    assert all({"name", "description", "inputSchema"} <= set(s) for s in specs)

    top = call_tool(built, "top_entities", {"k": 3})
    assert len(top) == 3
    detail = call_tool(built, "get_entity_details", {"entity_id": top[0]["entity_id"]})
    assert detail["entity"]["entity_id"] == top[0]["entity_id"]
    mer = call_tool(built, "render_mermaid", {"entity_id": top[0]["entity_id"]})
    assert mer.startswith("graph TD")
    pr = call_tool(built, "top_pagerank", {"k": 5})
    assert pr and pr[0]["rank"] >= pr[-1]["rank"] and pr[0]["name"]
    comp = call_tool(built, "graph_components", {"k": 5})
    assert comp and comp[0]["n_members"] >= comp[-1]["n_members"]
    rel = call_tool(built, "related_entities", {"seed_ids": [top[0]["entity_id"]], "k": 5})
    assert all(r["entity_id"] != top[0]["entity_id"] for r in rel)
    gs = call_tool(built, "graph_structure_stats", {"k_core_k": 2})
    assert gs["n_edges"] > 0 and gs["n_wedges"] >= gs["n_triangles"] * 3
    assert 0.0 <= gs["global_clustering"] <= 1.0
    assert 0 <= gs["k_core_size"]
    cen = call_tool(built, "get_centrality", {"k": 5})
    assert cen["top_harmonic"] and cen["effective_diameter"] >= 1
    hs = [r["harmonic"] for r in cen["top_harmonic"]]
    assert hs == sorted(hs, reverse=True)
    assert cen["distance_distribution"][-1]["frac"] == pytest.approx(1.0)
    cm = call_tool(built, "get_communities", {"k": 3, "with_modularity": True})
    assert set(cm) == {"communities", "modularity", "stats"} and cm["communities"]
    assert -0.5 <= cm["modularity"] <= 1.0
    assert cm["stats"] and len(cm["stats"]) <= 3
    for s in cm["stats"]:
        assert 0.0 <= s["conductance"] <= 1.0
        assert s["volume"] == 2 * s["n_internal"] + s["n_cut"]
    bet = call_tool(built, "get_betweenness", {"k": 5, "k_sources": 8})
    assert bet["top_betweenness"] and bet["k_sources"] == 8
    bs = [r["bc"] for r in bet["top_betweenness"]]
    assert bs == sorted(bs, reverse=True) and all(b >= 0.0 for b in bs)
    pat = call_tool(built, "match_pattern", {"steps": [{}, {}], "limit": 5})
    assert 0 < len(pat) <= 5 and set(pat[0]) == {"n0", "p1", "n1", "p2", "n2"}
    trend = call_tool(built, "get_trending_entities", {"k": 5})
    assert all(t["is_burst"] for t in trend)  # may be empty on uniform data
    with pytest.raises(KeyError):
        call_tool(built, "no_such_tool")
    assert set(TOOLS) == {s["name"] for s in specs}


def test_mcp_stdio_loop(built):
    from blarify_ray.tools import serve_mcp_stdio

    reqs = "\n".join(
        json.dumps(r)
        for r in [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
             "params": {"name": "top_entities", "arguments": {"k": 2}}},
            {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
             "params": {"name": "no_such_tool"}},
        ]
    )
    out = io.StringIO()
    serve_mcp_stdio(built, stdin=io.StringIO(reqs), stdout=out)
    resps = [json.loads(line) for line in out.getvalue().splitlines()]
    byid = {r["id"]: r for r in resps}
    assert byid[1]["result"]["serverInfo"]["name"] == "blarify_ray"
    assert len(byid[2]["result"]["tools"]) >= 11
    rows = json.loads(byid[3]["result"]["content"][0]["text"])
    assert len(rows) == 2
    assert "error" in byid[4]


def test_most_specific_join_prefers_narrowest():
    from blarify_ray.ops.joins import most_specific_join

    points = rd.from_arrow(
        pa.table({"k": [1, 1, 2], "pid": [10, 11, 12], "x": [5, 50, 5]})
    )
    intervals = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 2],
                "s": [0, 4, 100],
                "e": [100, 8, 200],  # wide [0,100) vs narrow [4,8)
                "tag": ["wide", "narrow", "far"],
            }
        )
    )
    got = most_specific_join(
        points, intervals, key="k", point_col="x", start_col="s", end_col="e",
        payload_cols=["tag"], tie_cols=["tag"],
    ).take_all()
    df = pd.DataFrame(got).sort_values("pid").reset_index(drop=True)
    # point (1,10,x=5): inside both → narrow wins; (1,11,x=50): only wide;
    # (2,12,x=5): no containing interval → dropped
    assert df["pid"].tolist() == [10, 11]
    assert df["tag"].tolist() == ["narrow", "wide"]


def test_interval_self_join_boundaries():
    """Banding join must keep pairs at exactly gap == window, drop
    gap == 0, and find pairs whose bucket indices differ by one."""
    import numpy as np

    from blarify_ray.ops.joins import interval_self_join

    W = 1_000_000  # 1 s window
    base = np.datetime64("2021-01-01T00:00:00", "us")
    rows = [
        # user 1: chain crossing bucket edges
        {"user_id": 1, "event_id": 1, "ts": base},
        {"user_id": 1, "event_id": 2, "ts": base + np.timedelta64(999_999, "us")},
        {"user_id": 1, "event_id": 3, "ts": base + np.timedelta64(1_000_000, "us")},  # == W from e1
        {"user_id": 1, "event_id": 4, "ts": base + np.timedelta64(2_000_001, "us")},  # > W from e3
        # same timestamp → gap 0 → excluded
        {"user_id": 2, "event_id": 5, "ts": base},
        {"user_id": 2, "event_id": 6, "ts": base},
        # different users never pair
        {"user_id": 3, "event_id": 7, "ts": base},
        {"user_id": 4, "event_id": 8, "ts": base + np.timedelta64(1, "us")},
    ]
    ds = rd.from_items(rows)
    got = {
        (r["user_id"], r["id_a"], r["id_b"]): r["gap_us"]
        for r in interval_self_join(ds, "user_id", "ts", "event_id", W).take_all()
    }
    assert set(got) == {(1, 1, 2), (1, 1, 3), (1, 2, 3)}
    assert got[(1, 1, 3)] == W  # inclusive upper bound
