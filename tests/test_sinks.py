"""Sink contract: both GraphSink implementations round-trip the same
rows (the AbstractDbManager two-backend parity check)."""

import os
import shutil

import ray.data as rd

from blarify_ray.sinks import JsonlSink, ParquetSink

ROWS = [
    {"entity_id": f"e{i:02d}", "name": f"N{i}", "type": "ORG", "bucket": i % 3}
    for i in range(20)
]
EDGES = [
    {"src_id": f"e{i:02d}", "dst_id": f"e{(i+1)%20:02d}", "pred": "REL", "bucket": i % 3}
    for i in range(20)
]


def _norm(rows):
    # hive-partitioned reads return the partition value as a string
    return {
        tuple(sorted({**r, "bucket": int(r["bucket"])}.items())) for r in rows
    }


def _read_jsonl(path):
    return _norm(rd.read_json(path).take_all())


def _read_parquet(path):
    return _norm(rd.read_parquet(path).take_all())


def test_sinks_round_trip_identical_rows():
    base = "/tmp/blarify_ray_test_sinks"
    shutil.rmtree(base, ignore_errors=True)
    ents = rd.from_items(ROWS)
    edges = rd.from_items(EDGES)

    pq_sink, js_sink = ParquetSink(), JsonlSink()
    pq_sink.save_nodes(ents, os.path.join(base, "pq_nodes"))
    pq_sink.save_edges(edges, os.path.join(base, "pq_edges"))
    js_sink.save_nodes(ents, os.path.join(base, "js_nodes"))
    js_sink.save_edges(edges, os.path.join(base, "js_edges"))

    want_nodes = _norm(ROWS)
    want_edges = _norm(EDGES)
    assert _read_parquet(os.path.join(base, "pq_nodes")) == want_nodes
    assert _read_parquet(os.path.join(base, "pq_edges")) == want_edges
    assert _read_jsonl(os.path.join(base, "js_nodes")) == want_nodes
    assert _read_jsonl(os.path.join(base, "js_edges")) == want_edges
