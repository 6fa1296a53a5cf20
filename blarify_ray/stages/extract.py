"""S1 — HTML→text extraction + latest-crawl dedup.

Ray Data expression of the reference's parse pass
(``blarify/code_hierarchy/tree_sitter_helper.py:72-175`` +
``project_graph_creator.py:83-101``): a stateless ``map_batches`` that
turns each page row into a doc row (text byte-identical to the serial
reference — same ``html_to_text``), dropping the heavy ``html`` column
immediately so the url-dedup shuffle moves text, not raw bytes.

Size-cap semantics follow the serial spec (``serial.py:42-46``) EXACTLY:
latest-crawl-wins dedup runs FIRST, and a url is dropped iff its WINNING
crawl is oversize — an older in-cap crawl of such a url must NOT survive.
Oversize rows therefore flow through the dedup carrying an ``_oversize``
flag (they are never parsed: their text is irrelevant, they either win —
and the url is dropped — or lose). The cap itself mirrors the 0.8 MB file
cap (``project_files_iterator.py:21,96``): explicit drop + flag, never
silent truncation. Unsupported langs pass through as RAW rows
(``FallbackDefinitions``, ``tree_sitter_helper.py:83-91``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Sum

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..schemas import DOCS

DOCS_PRE_DEDUP = DOCS.append(pa.field("_oversize", pa.bool_()))

# below this many pages the latest-crawl winner partials merge on the
# driver (one vectorized pandas groupby — seconds); above it they go
# through a distributed groupby exchange. Both produce the identical
# contested-url map.
DEDUP_DRIVER_MERGE_MAX = 20_000_000


def _rows_to_docs(part: pa.Table, cfg: PipelineConfig, oversize: bool, out: dict) -> None:
    from ..text import html_to_text, split_sentences, text_sha256

    urls = part["url"].to_pylist()
    tss = part["warc_ts"].to_pylist()
    # oversize rows are never parsed: they participate in the dedup
    # (their timestamp decides the url's fate) but contribute no text —
    # and their multi-hundred-KB html NEVER crosses into Python objects
    htmls = [None] * part.num_rows if oversize else part["html"].to_pylist()
    pretexts = part["text"].to_pylist()
    langs = part["lang"].to_pylist()
    from ..langs import for_lang

    for url, ts, html, pre, lang in zip(urls, tss, htmls, pretexts, langs):
        text = "" if oversize else (pre or html_to_text(html or b""))
        # RAW when the lang is not enabled OR has no registered
        # definitions (FallbackDefinitions semantics)
        raw = lang not in cfg.supported_langs or for_lang(lang) is None
        n_sents = 0 if raw else len(split_sentences(text))
        out["url"].append(url)
        out["warc_ts"].append(ts)
        out["lang"].append(lang)
        out["text"].append(text)
        out["text_sha"].append(text_sha256(text))
        out["raw"].append(raw)
        out["n_sents"].append(n_sents)
        out["_oversize"].append(oversize)


def _extract_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    lens = pc.binary_length(pc.coalesce(batch["html"], pa.scalar(b"", pa.binary())))
    big = pc.greater(lens, cfg.max_html_bytes)
    out: dict[str, list] = {
        k: [] for k in ("url", "warc_ts", "lang", "text", "text_sha", "raw", "n_sents", "_oversize")
    }
    _rows_to_docs(batch.filter(pc.invert(big)), cfg, False, out)
    _rows_to_docs(batch.filter(big), cfg, True, out)
    return pa.Table.from_pydict(out, schema=DOCS_PRE_DEDUP)


def extract_docs(pages: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """pages → pre-dedup docs rows carrying ``_oversize``. Feed through
    ``dedup_latest`` then ``drop_oversize`` (or use ``extract_and_dedup``)."""
    return pages.map_batches(
        lambda t: _extract_batch(t, cfg),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )


def drop_oversize(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Drop urls whose WINNING crawl is oversize (run AFTER dedup_latest —
    the spec's ordering, serial.py:42-46)."""
    return docs.map_batches(
        lambda t: t.filter(pc.invert(t["_oversize"])).drop_columns(["_oversize"]),
        batch_format="pyarrow",
    )


def latest_ts_map(
    pages: ray.data.Dataset, key: str = "url", ts: str = "warc_ts", limit: int = 0
) -> dict | None:
    """{url: max warc_ts} for urls with MORE THAN ONE crawl, from a
    PRUNED (url, ts) scan: vectorized per-batch partial (max + crawl
    count per url, no shuffle), merged vectorized (driver under
    ``DEDUP_DRIVER_MERGE_MAX`` pages, distributed groupby above).
    Keeping only contested urls makes the broadcast map duplicate-scale
    (a few k entries), not corpus-scale. Returns None when the CONTESTED
    count exceeds ``limit`` — the broadcast dict would be too big — and
    the caller falls back to the shuffle dedup."""

    def partial(t: pa.Table) -> pa.Table:
        # int64 µs timestamps: the winner map must stay cheap to pickle
        # and broadcast (datetime objects are not)
        g = (
            pa.table({key: t[key], "_ts64": pc.cast(t[ts], pa.int64())})
            .group_by(key)
            .aggregate([("_ts64", "max"), ("_ts64", "count")])
        )
        return g.rename_columns([key, "_ts64", "_n"])

    partials = pages.select_columns([key, ts]).map_batches(
        partial, batch_format="pyarrow", batch_size=8192
    )
    # Merge tier: the per-batch partials are ~one narrow row per distinct
    # url per batch. Under the cap a single vectorized driver groupby
    # (seconds for tens of millions of rows) beats a distributed
    # aggregation's exchange by an order of magnitude; above it the
    # groupby exchange takes over — either way the BROADCAST map holds
    # only contested urls (duplicate-scale).
    n_pages = pages.count()  # parquet metadata — no scan
    if n_pages <= DEDUP_DRIVER_MERGE_MAX:
        df = partials.to_pandas()
        if key not in df.columns:  # empty input
            return {}
        agg = df.groupby(key, sort=False).agg(ts_max=("_ts64", "max"), n=("_n", "sum"))
        dups = agg[agg["n"] >= 2]["ts_max"]
        if limit and len(dups) > limit:
            return None
        return dict(zip(dups.index, dups.astype("int64")))

    def contested(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["sum(_n)"], 2))

    from ..util import hash_shuffle_scope

    with hash_shuffle_scope():
        agg_ds = (
            partials.groupby(key).aggregate(Max("_ts64"), Sum("_n")).materialize()
        )
    dups = agg_ds.map_batches(contested, batch_format="pyarrow").to_pandas()
    if "max(_ts64)" not in dups.columns:  # empty → no columns
        return {}
    if limit and len(dups) > limit:
        return None
    return dict(zip(dups[key], dups["max(_ts64)"].astype("int64")))


def extract_and_dedup(pages: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """pages → final docs: latest-crawl-wins dedup → extract → oversize
    drop, in the spec's order.

    Size-tiered dedup: while the winner map (url → max ts) fits
    (``cfg.dedup_broadcast_max``), losing crawls are dropped by a
    broadcast filter BEFORE extraction — the heavy text column never
    shuffles, and stale crawls are never parsed. Above the threshold the
    post-extract hash-partitioned shuffle dedup takes over. Crawl
    timestamps are assumed unique per url (ties are order-dependent in
    the serial spec and nondeterministic in BOTH distributed tiers)."""
    import ray

    winners = latest_ts_map(pages, limit=cfg.dedup_broadcast_max)
    if winners is None:
        return drop_oversize(dedup_latest(extract_docs(pages, cfg)))
    if not winners:  # every url has exactly one crawl — nothing to drop
        return drop_oversize(extract_docs(pages, cfg))
    win_ref = ray.put(winners)

    def keep_winners(t: pa.Table) -> pa.Table:
        import numpy as np

        from ..util import get_broadcast

        w = get_broadcast(win_ref)
        # the map covers only CONTESTED urls — vectorized membership test
        # first, then a Python check over just those few rows
        contested = pc.is_in(t["url"], value_set=pa.array(list(w), pa.string()))
        idx = np.flatnonzero(contested.to_numpy(zero_copy_only=False))
        if idx.size == 0:
            return t
        mask = np.ones(t.num_rows, dtype=bool)
        urls, ts64 = t["url"], pc.cast(t["warc_ts"], pa.int64())
        for i in idx:
            mask[i] = w[urls[i].as_py()] == ts64[i].as_py()
        return t.filter(pa.array(mask))

    return drop_oversize(
        extract_docs(pages.map_batches(keep_winners, batch_format="pyarrow"), cfg)
    )


def dedup_latest(
    docs: ray.data.Dataset, key: str = "url", ts: str = "warc_ts", partitions: int = 64
) -> ray.data.Dataset:
    """Latest-crawl-wins exact dedup: hash-partition by url, keep the
    max-ts row per url (the only temporal rule in the engine,
    SURVEY.md §2.8).

    The shuffle runs AFTER html is dropped, so it moves extracted text
    only (~10× lighter). The groupby key is ``hash(url) % partitions``
    (one Ray-level group per partition, vectorized argmax inside) — not
    one Python call per url.
    """
    from ..ids import stable_u64

    def add_pkey(t: pa.Table) -> pa.Table:
        pk = [stable_u64(u) % partitions for u in t[key].to_pylist()]
        return t.append_column("_pkey", pa.array(pk, pa.int32()))

    def latest_in_partition(g: pa.Table) -> pa.Table:
        import numpy as np

        urls = g[key].to_pylist()
        tss = g[ts].to_pylist()
        best: dict[str, int] = {}
        for i, (u, v) in enumerate(zip(urls, tss)):
            j = best.get(u)
            if j is None or v > tss[j]:
                best[u] = i
        take = np.sort(np.fromiter(best.values(), dtype=np.int64))
        return g.take(pa.array(take)).drop_columns(["_pkey"])

    return (
        docs.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(latest_in_partition, batch_format="pyarrow")
    )
