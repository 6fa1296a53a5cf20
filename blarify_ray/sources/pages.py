"""Pages source — the engine's ``read_parquet`` entry plus the
deterministic synthetic-corpus generator expressed as a Ray Data pipeline
(``range(n) → map_batches(gen)``), so corpus creation itself is
distributed and streaming (no driver-side row loop).

Analog of the reference's ``ProjectFilesIterator``
(``blarify/project_file_explorer/project_files_iterator.py:39-103``):
filters (size cap, lang) are applied downstream in the extract stage as
vectorized Arrow predicates rather than at the source, except column
pruning which happens at the read.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..corpus import gen_page_rows
from ..schemas import PAGES


def pages_count_for_sf(sf_dir: str) -> int:
    """Corpus size scales with the driver's testdata: 500 / 5k / 50k
    logical pages at sf 0.001 / 0.01 / 0.1 (documents rows don't scale
    linearly across sf dirs, lineitem does)."""
    docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    li = pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
    return max(docs, li // 12)


def synth_pages(
    n_pages: int,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Distributed deterministic corpus: block-parallel generation, pure
    function of the page index (corpus.py)."""
    if override_num_blocks is None:
        override_num_blocks = max(8, min(256, n_pages // 256))

    def gen(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for i in batch["id"].to_pylist():
            rows.extend(gen_page_rows(i, n_pages, max_html_bytes=cfg.max_html_bytes))
        return pa.Table.from_pylist(rows, schema=PAGES)

    return ray.data.range(n_pages, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=512
    )


def write_pages_parquet(out_dir: str, n_pages: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    """Persist a corpus once (bench reads it back like a real crawl)."""
    os.makedirs(out_dir, exist_ok=True)
    synth_pages(n_pages, cfg).write_parquet(out_dir)
    return out_dir


def read_pages(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """The real entry for crawl data: parquet with projection pushdown."""
    return ray.data.read_parquet(path, columns=columns)
