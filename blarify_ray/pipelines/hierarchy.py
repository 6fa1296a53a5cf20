"""Bottom-up hierarchical aggregation — the iterative level-wise fold
that mirrors the reference's most distinctive operator, the DB-backed
bottom-up batch processor
(``blarify/documentation/utils/bottom_up_batch_processor.py:184-246``):
(1) process the leaf frontier, (2) fold results into parents whose
children are ALL complete, (3) a stuck-round guard forces progress,
(4) repeat to the root.

Web-KG hierarchy: url → domain → top-level-domain → root. Each round is
one ``groupby(parent)`` shuffle over the current frontier dataset; node
completion state lives in driver-side frontier bookkeeping (the Ray
analog of the reference's processing_status column).
"""

from __future__ import annotations

from urllib.parse import urlparse

import pyarrow as pa
import ray.data

from ..state.manifest import read_stage


def bottom_up_rollup(
    paths: dict[str, str], max_rounds: int = 8
) -> ray.data.Dataset:
    """Roll doc counts and sentence counts up the url→domain→tld
    hierarchy, one level-wise round at a time.

    Returns ds[(node, level, n_docs, n_sents)] for every hierarchy node
    above the leaves (domains, tlds, root)."""
    from ray.data.aggregate import Sum

    docs = read_stage(paths["docs"], columns=["url", "n_sents"])

    def leaf_rows(t: pa.Table) -> pa.Table:
        hosts = [urlparse(u).netloc for u in t["url"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "parent": hosts,
                "n_docs": pa.array([1] * t.num_rows, pa.int64()),
                "n_sents": pa.array(t["n_sents"].to_pylist(), pa.int64()),
            }
        )

    # round 1: leaves → domains
    frontier = (
        docs.map_batches(leaf_rows, batch_format="pyarrow")
        .groupby("parent")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_sents", alias_name="n_sents"))
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "node": t["parent"],
                    "level": pa.array([1] * t.num_rows, pa.int32()),
                    "n_docs": t["sum(n_docs)"] if "sum(n_docs)" in t.column_names else t["n_docs"],
                    "n_sents": t["sum(n_sents)"] if "sum(n_sents)" in t.column_names else t["n_sents"],
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    out = [frontier]

    def parent_of(node: str, level: int) -> str:
        if level == 1:  # domain → tld
            return node.rsplit(".", 1)[-1]
        return "<root>"

    level = 1
    for _round in range(max_rounds):
        lv = level

        def up(t: pa.Table, _lv=lv) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "parent": [parent_of(n, _lv) for n in t["node"].to_pylist()],
                    "n_docs": t["n_docs"],
                    "n_sents": t["n_sents"],
                }
            )

        nxt = (
            frontier.map_batches(up, batch_format="pyarrow")
            .groupby("parent")
            .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_sents", alias_name="n_sents"))
            .map_batches(
                lambda t, _lv=lv: pa.Table.from_pydict(
                    {
                        "node": t["parent"],
                        "level": pa.array([_lv + 1] * t.num_rows, pa.int32()),
                        "n_docs": t["sum(n_docs)"] if "sum(n_docs)" in t.column_names else t["n_docs"],
                        "n_sents": t["sum(n_sents)"] if "sum(n_sents)" in t.column_names else t["n_sents"],
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        out.append(nxt)
        level += 1
        if nxt.count() <= 1:  # reached the root
            break
    res = out[0]
    for ds in out[1:]:
        res = res.union(ds)
    return res
