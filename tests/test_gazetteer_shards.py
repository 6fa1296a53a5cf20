"""Sharded-gazetteer tier: probe-key hive layout must match the
broadcast Gazetteer EXACTLY (unit parity + forced-tier e2e)."""

import os
import shutil

import pytest

from blarify_ray.corpus import entity_universe, gen_page_rows
from blarify_ray.rules import Gazetteer
from blarify_ray.stages.gazetteer_shards import (
    ShardedGazetteer,
    build_gazetteer_shards,
    shard_of,
)

N = 80
SHARDS_OUT = "/tmp/blarify_ray_test_gaz_shards"


@pytest.fixture(scope="module")
def sharded(ray_session):
    shutil.rmtree(SHARDS_OUT, ignore_errors=True)
    ents = entity_universe(N)
    build_gazetteer_shards(ents, SHARDS_OUT, n_shards=8)
    return ents, SHARDS_OUT


def test_layout_is_hive_by_first_token(sharded):
    ents, d = sharded
    dirs = [x for x in os.listdir(d) if x.startswith("shard=")]
    assert 1 < len(dirs) <= 8
    import pyarrow.parquet as pq

    for sd in dirs:
        sid = int(sd.split("=")[1])
        t = pq.read_table(os.path.join(d, sd), columns=["alias_norm"])
        for n in t["alias_norm"].to_pylist():
            assert shard_of(n.split()[0], 8) == sid


def test_find_mentions_and_candidates_parity(sharded):
    """Every sentence of a real page corpus must match identically
    through the sharded and the in-memory gazetteer, including with a
    tiny LRU (forced shard churn) for the matching surface."""
    from blarify_ray.text import split_sentences

    ents, d = sharded
    full = Gazetteer(ents)
    sg = ShardedGazetteer(d, max_cached=64)
    sg_tiny = ShardedGazetteer(d, max_cached=2)
    rows = []
    for i in range(12):
        rows.extend(gen_page_rows(i, N))
    from blarify_ray.text import html_to_text

    n_sent = n_ment = 0
    for r in rows:
        text = html_to_text(r["html"]) if r.get("html") else ""
        for sent in split_sentences(text):
            want = full.find_mentions(sent)
            assert sg.find_mentions(sent) == want
            assert sg_tiny.find_mentions(sent) == want
            n_sent += 1
            n_ment += len(want)
            for m in want:
                assert sg.candidates(m.surface) == full.candidates(m.surface)
    assert n_sent > 20 and n_ment > 10  # the corpus actually exercises it


def test_entity_metadata_refcounted_eviction(sharded):
    ents, d = sharded
    sg = ShardedGazetteer(d, max_cached=1)
    # touch several shards; cache holds one — metadata shrinks with it
    toks = {e.name.split()[0].lower() for e in ents[:20]}
    for t in toks:
        sg._struct_for(t)
        assert len(sg._cache) == 1
    # whatever remains loaded resolves; evicted idxs are gone
    assert len(sg._ents) > 0
    loaded = next(iter(sg._cache.values()))
    for idx in loaded.ents:
        assert sg.entities[idx].name == loaded.ents[idx].name
