"""WARC-style crawl-archive source — the Common-Crawl ingestion form of
the pages table.

The engine's page contract is the parquet table ``(url, warc_ts, html,
text, lang)``; real crawls arrive as WARC response records. This module
round-trips that contract through a simplified-but-structurally-faithful
WARC framing (version line, named headers, ``Content-Length``-framed
binary payload — the parse uses the declared length, never delimiter
splitting, so payloads containing header-like bytes survive):

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: <ISO-8601 µs>\\r\\n
    X-Crawl-Lang: <lang>\\r\\n
    Content-Length: <len(html)>\\r\\n
    \\r\\n
    <html bytes>\\r\\n\\r\\n

Writes are DISTRIBUTED and deterministic: each Ray block becomes one
gzip shard named by the md5 of its record bytes (re-runs overwrite
byte-identical files — the retry-safe deterministic-filename tee
pattern, ``pipelines/kg_build.py``). Reads are
``ray.data.read_binary_files`` over the shard dir + a per-file parser
(one Python loop per RECORD, never per byte) emitting PAGES-schema
batches — so a WARC-ingested corpus feeds ``build_kg(pages=...)``
unchanged. Reference analog: ``ProjectFilesIterator`` reading an
on-disk tree (``project_files_iterator.py:39-103``); here the "tree" is
a crawl-archive directory.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data

from ..schemas import PAGES

_EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def _ts_to_iso(us: int) -> str:
    return str(_EPOCH + np.timedelta64(int(us), "us")) + "Z"


def _iso_to_us(iso: str) -> int:
    return int(
        (np.datetime64(iso.rstrip("Z"), "us") - _EPOCH) // np.timedelta64(1, "us")
    )


def _record_bytes(url: str, ts_us: int, html: bytes, lang: str) -> bytes:
    if "\r" in url or "\n" in url or "\r" in lang or "\n" in lang:
        raise ValueError(f"CR/LF in WARC header field: {url!r} / {lang!r}")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_ts_to_iso(ts_us)}\r\n"
        f"X-Crawl-Lang: {lang}\r\n"
        f"Content-Length: {len(html)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + html + b"\r\n\r\n"


def _write_shard(blob: bytes, out_dir: str, ext: str) -> str:
    """Content-hash-named gzip shard with atomic replace: retries of the
    same batch rewrite byte-identical files. Two genuinely IDENTICAL
    batches collide to one shard (their bytes are equal — effectively a
    batch-level dedup; the synth/crawl contract has unique urls, so
    identical batches only arise from duplicated inputs)."""
    name = hashlib.md5(blob).hexdigest()
    path = os.path.join(out_dir, f"{name}{ext}")
    tmp = path + ".tmp"
    with gzip.open(tmp, "wb", compresslevel=1) as f:
        f.write(blob)
    os.replace(tmp, path)
    return name


def _clean_shards(out_dir: str, ext: str) -> None:
    """Driver-side pre-clean: a RE-export must not union with a previous
    export's shards (content-hash names never collide across exports)."""
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(ext) or f.endswith(ext + ".tmp"):
            os.remove(os.path.join(out_dir, f))


def _shard_files(src_dir: str, ext: str) -> list[str]:
    """Explicit sorted shard list (never directory-walk: excludes crashed
    writes' ``.tmp`` files and foreign files)."""
    return sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir) if f.endswith(ext)
    )


def archive_fingerprint(src_dir: str, ext: str = ".warc.gz") -> str:
    """Content fingerprint of a shard dir — the filenames ARE content
    hashes, so a digest of the sorted listing changes exactly when the
    archive's bytes do (used for checkpoint lineage by the CLI)."""
    names = ";".join(os.path.basename(f) for f in _shard_files(src_dir, ext))
    return hashlib.md5(names.encode("utf-8")).hexdigest()


def write_pages_warc(pages: ray.data.Dataset, out_dir: str) -> str:
    """Persist a PAGES-schema dataset as gzip WARC shards (one per Ray
    block — ``batch_size=None`` keeps whole blocks together — with
    deterministic content-hash filenames; the dir is pre-cleaned of
    previous exports). ``text`` must be empty (crawl archives carry raw
    html; text is DERIVED downstream) — a non-empty text row raises
    rather than silently dropping data."""
    _clean_shards(out_dir, ".warc.gz")

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({"shard": pa.array([], pa.string())})
        import pyarrow.compute as pc

        if pc.any(pc.not_equal(t["text"], "")).as_py():
            raise ValueError("WARC export requires empty text (derived downstream)")
        ts = t["warc_ts"].cast(pa.int64()).to_pylist()
        parts = [
            _record_bytes(u, s, h, lg)
            for u, s, h, lg in zip(
                t["url"].to_pylist(), ts, t["html"].to_pylist(),
                t["lang"].to_pylist(),
            )
        ]
        name = _write_shard(b"".join(parts), out_dir, ".warc.gz")
        return pa.Table.from_pydict({"shard": pa.array([name], pa.string())})

    pages.map_batches(dump, batch_format="pyarrow", batch_size=None).materialize()
    return out_dir


def _parse_records(blob: bytes) -> list[dict]:
    rows: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.index(b"\r\n\r\n", pos)
        headers = blob[pos:head_end].decode("utf-8").split("\r\n")
        if not headers or headers[0] != "WARC/1.0":
            raise ValueError(f"bad WARC record at offset {pos}")
        h = dict(line.split(": ", 1) for line in headers[1:] if ": " in line)
        clen = int(h["Content-Length"])
        body_start = head_end + 4
        html = blob[body_start : body_start + clen]
        rows.append(
            {
                "url": h["WARC-Target-URI"],
                "warc_ts": int(_iso_to_us(h["WARC-Date"])),
                "html": html,
                "text": "",
                "lang": h.get("X-Crawl-Lang", ""),
            }
        )
        pos = body_start + clen + 4  # skip trailing \r\n\r\n
    return rows


def _rows_to_pages(rows: list[dict]) -> pa.Table:
    if not rows:
        return pa.Table.from_pydict(
            {f.name: pa.array([], f.type) for f in PAGES}, schema=PAGES
        )
    tbl = pa.Table.from_pylist(rows)
    return pa.Table.from_pydict(
        {
            "url": tbl["url"].cast(pa.string()),
            "warc_ts": tbl["warc_ts"].cast(pa.timestamp("us")),
            "html": tbl["html"].cast(pa.binary()),
            "text": tbl["text"].cast(pa.string()),
            "lang": tbl["lang"].cast(pa.string()),
        },
    ).cast(PAGES)


def read_pages_warc(warc_dir: str) -> ray.data.Dataset:
    """WARC shard dir → PAGES-schema dataset (distributed parse over the
    explicit ``*.warc.gz`` shard list — crashed writes' ``.tmp`` files
    are never ingested)."""

    def parse(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in t["bytes"].to_pylist():
            # Ray's read_binary_files auto-decompresses .gz paths; keep
            # the magic-byte check so raw blobs also parse
            if blob[:2] == b"\x1f\x8b":
                blob = gzip.decompress(blob)
            rows.extend(_parse_records(blob))
        return _rows_to_pages(rows)

    return ray.data.read_binary_files(
        _shard_files(warc_dir, ".warc.gz")
    ).map_batches(parse, batch_format="pyarrow")


# --- JSONL sibling (crawl dumps as JSON lines, html base64-encoded) ----------


def write_pages_jsonl(pages: ray.data.Dataset, out_dir: str) -> str:
    """PAGES dataset → gzip JSONL shards (html base64 — JSON carries no
    binary); same deterministic content-hash shard naming as the WARC
    writer."""
    import base64
    import json

    _clean_shards(out_dir, ".jsonl.gz")

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({"shard": pa.array([], pa.string())})
        ts = t["warc_ts"].cast(pa.int64()).to_pylist()
        lines = [
            json.dumps(
                {
                    "url": u,
                    "warc_ts": s,
                    "html_b64": base64.b64encode(h).decode("ascii"),
                    "lang": lg,
                },
                sort_keys=True,
            )
            for u, s, h, lg in zip(
                t["url"].to_pylist(), ts, t["html"].to_pylist(),
                t["lang"].to_pylist(),
            )
        ]
        name = _write_shard(
            ("\n".join(lines) + "\n").encode("utf-8"), out_dir, ".jsonl.gz"
        )
        return pa.Table.from_pydict({"shard": pa.array([name], pa.string())})

    pages.map_batches(dump, batch_format="pyarrow", batch_size=None).materialize()
    return out_dir


def read_pages_jsonl(jsonl_dir: str) -> ray.data.Dataset:
    """JSONL shard dir → PAGES-schema dataset (distributed per-shard
    parse, one json.loads per LINE)."""
    import base64
    import json

    def parse(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in t["bytes"].to_pylist():
            if blob[:2] == b"\x1f\x8b":
                blob = gzip.decompress(blob)
            for line in blob.decode("utf-8").splitlines():
                if not line:
                    continue
                o = json.loads(line)
                rows.append(
                    {
                        "url": o["url"],
                        "warc_ts": int(o["warc_ts"]),
                        "html": base64.b64decode(o["html_b64"]),
                        "text": "",
                        "lang": o["lang"],
                    }
                )
        return _rows_to_pages(rows)

    return ray.data.read_binary_files(
        _shard_files(jsonl_dir, ".jsonl.gz")
    ).map_batches(parse, batch_format="pyarrow")
