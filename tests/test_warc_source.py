"""WARC-style crawl-archive source: byte-exact page-table round-trip
(html payloads containing header-like bytes survive the
Content-Length framing), and the flagship invariant — a KG built from
WARC-ingested pages is IDENTICAL to one built from the synthetic
source (same entities, same edges, byte-identical text per url)."""

import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from blarify_ray.schemas import PAGES
from blarify_ray.sources.pages import synth_pages
from blarify_ray.sources.warc import read_pages_warc, write_pages_warc

N = 45
WDIR = "/tmp/blarify_ray_test_warc"


def _rows(ds):
    out = []
    for r in ds.take_all():
        out.append((r["url"], np.datetime64(r["warc_ts"], "us"), r["html"], r["text"], r["lang"]))
    return sorted(out)


def test_roundtrip_byte_exact():
    shutil.rmtree(WDIR, ignore_errors=True)
    pages = synth_pages(N)
    write_pages_warc(pages, WDIR)
    back = read_pages_warc(WDIR)
    assert back.schema().names == PAGES.names
    assert _rows(back) == _rows(synth_pages(N))


def test_adversarial_payload_framing():
    # html containing WARC-header-like bytes and \r\n\r\n separators must
    # survive: the parser frames by Content-Length, never by delimiter
    evil = b"<html>\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\n</html>"
    tbl = pa.Table.from_pydict(
        {
            "url": pa.array(["https://x.test/a", "https://x.test/b"], pa.string()),
            "warc_ts": pa.array([1_600_000_000_000_000, 1_600_000_001_000_000], pa.timestamp("us")),
            "html": pa.array([evil, b"<html>ok</html>"], pa.binary()),
            "text": pa.array(["", ""], pa.string()),
            "lang": pa.array(["en", "de"], pa.string()),
        },
        schema=PAGES,
    )
    d = "/tmp/blarify_ray_test_warc_evil"
    shutil.rmtree(d, ignore_errors=True)
    write_pages_warc(ray.data.from_arrow(tbl), d)
    got = {r["url"]: r for r in read_pages_warc(d).take_all()}
    assert got["https://x.test/a"]["html"] == evil
    assert got["https://x.test/b"]["lang"] == "de"


def test_kg_from_warc_identical_to_synth():
    from blarify_ray.pipelines.kg_build import build_kg
    from blarify_ray.state.manifest import read_stage

    wdir = "/tmp/blarify_ray_test_warc_kg_src"
    a_dir = "/tmp/blarify_ray_test_warc_kg_a"
    b_dir = "/tmp/blarify_ray_test_warc_kg_b"
    for d in (wdir, a_dir, b_dir):
        shutil.rmtree(d, ignore_errors=True)
    write_pages_warc(synth_pages(N), wdir)
    pa_ = build_kg(a_dir, N)  # synthetic source
    pb = build_kg(
        b_dir, N, pages=read_pages_warc(wdir), source_fingerprint=f"warc-{N}"
    )

    def stage_rows(paths, stage, cols):
        return sorted(
            tuple(r[c] for c in cols)
            for r in read_stage(paths[stage], columns=cols).take_all()
        )

    assert stage_rows(pa_, "docs", ["url", "text_sha", "lang", "n_sents"]) == stage_rows(
        pb, "docs", ["url", "text_sha", "lang", "n_sents"]
    )
    assert stage_rows(pa_, "entities", ["entity_id", "name", "type", "n_mentions"]) == stage_rows(
        pb, "entities", ["entity_id", "name", "type", "n_mentions"]
    )
    assert stage_rows(pa_, "edges", ["src_id", "dst_id", "pred", "weight"]) == stage_rows(
        pb, "edges", ["src_id", "dst_id", "pred", "weight"]
    )


def test_jsonl_roundtrip_byte_exact():
    from blarify_ray.sources.warc import read_pages_jsonl, write_pages_jsonl

    d = "/tmp/blarify_ray_test_jsonl"
    shutil.rmtree(d, ignore_errors=True)
    write_pages_jsonl(synth_pages(N), d)
    back = read_pages_jsonl(d)
    assert back.schema().names == PAGES.names
    assert _rows(back) == _rows(synth_pages(N))


def test_reexport_cleans_previous_shards():
    from blarify_ray.sources.warc import archive_fingerprint, write_pages_warc

    d = "/tmp/blarify_ray_test_warc_reexp"
    shutil.rmtree(d, ignore_errors=True)
    write_pages_warc(synth_pages(20), d)
    fp1 = archive_fingerprint(d)
    write_pages_warc(synth_pages(30), d)  # re-export: no union with old shards
    fp2 = archive_fingerprint(d)
    assert fp1 != fp2  # content fingerprint tracks the archive bytes
    back = read_pages_warc(d)
    assert back.count() >= 30
    assert _rows(back) == _rows(synth_pages(30))


def test_crlf_header_fields_rejected():
    from blarify_ray.sources.warc import _record_bytes

    with pytest.raises(ValueError):
        _record_bytes("https://x/a\r\nX-Evil: 1", 0, b"", "en")
    with pytest.raises(ValueError):
        _record_bytes("https://x/a", 0, b"", "e\nn")


def test_nonempty_text_rejected():
    from blarify_ray.sources.warc import write_pages_warc

    tbl = pa.table(
        {
            "url": pa.array(["https://x/a"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([b"<html/>"], pa.binary()),
            "text": pa.array(["already extracted"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        },
        schema=PAGES,
    )
    d = "/tmp/blarify_ray_test_warc_text"
    shutil.rmtree(d, ignore_errors=True)
    with pytest.raises(Exception):
        write_pages_warc(ray.data.from_arrow(tbl), d)
