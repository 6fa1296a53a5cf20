"""Snapshot diff — ADDED / DELETED / MODIFIED between two built graphs.

Analog of the reference's diff creator: hash-join current nodes against
``PreviousNodeState`` on the environment-independent id; matched+changed
→ MODIFIED, unmatched-previous → DELETED, unmatched-current → ADDED
(``blarify/project_graph_diff_creator.py:126-184``).

Implemented as a full-outer comparison over the two entity tables,
co-partitioned by the shared hash bucket (both snapshots use the same
deterministic id scheme, so equal entities land in equal buckets — the
diff never shuffles across buckets)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..state.manifest import read_stage

_COLS = ["entity_id", "name", "type", "aliases", "n_mentions", "bucket"]


def entity_diff(paths_old: dict[str, str], paths_new: dict[str, str]) -> ray.data.Dataset:
    """→ ds[(entity_id, name, type, change, n_mentions_old, n_mentions_new)]
    with change ∈ {ADDED, DELETED, MODIFIED} (unchanged rows omitted)."""

    def tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return f

    old = read_stage(paths_old["entities"], columns=_COLS).map_batches(
        tag("old"), batch_format="pyarrow"
    )
    new = read_stage(paths_new["entities"], columns=_COLS).map_batches(
        tag("new"), batch_format="pyarrow"
    )

    def diff_partition(g: pa.Table) -> pa.Table:
        olds: dict[str, dict] = {}
        news: dict[str, dict] = {}
        for row in g.to_pylist():
            (olds if row["_side"] == "old" else news)[row["entity_id"]] = row
        out = {
            "entity_id": [], "name": [], "type": [], "change": [],
            "n_mentions_old": [], "n_mentions_new": [],
        }

        def emit(eid: str, row: dict, change: str, n_old, n_new):
            out["entity_id"].append(eid)
            out["name"].append(row["name"])
            out["type"].append(row["type"])
            out["change"].append(change)
            out["n_mentions_old"].append(n_old)
            out["n_mentions_new"].append(n_new)

        for eid in sorted(set(olds) | set(news)):
            o, n = olds.get(eid), news.get(eid)
            if o is None:
                emit(eid, n, "ADDED", None, n["n_mentions"])
            elif n is None:
                emit(eid, o, "DELETED", o["n_mentions"], None)
            elif (
                o["n_mentions"] != n["n_mentions"]
                or list(o["aliases"]) != list(n["aliases"])
            ):
                emit(eid, n, "MODIFIED", o["n_mentions"], n["n_mentions"])
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [("entity_id", pa.string()), ("name", pa.string()), ("type", pa.string()),
                 ("change", pa.string()), ("n_mentions_old", pa.int64()),
                 ("n_mentions_new", pa.int64())]
            ),
        )

    return old.union(new).groupby("bucket").map_groups(diff_partition, batch_format="pyarrow")
