"""Snapshot diff — ADDED / DELETED / MODIFIED between two built graphs.

Analog of the reference's diff creator: hash-join current nodes against
``PreviousNodeState`` on the environment-independent id; matched+changed
→ MODIFIED, unmatched-previous → DELETED, unmatched-current → ADDED
(``blarify/project_graph_diff_creator.py:126-184``).

Implemented as a full-outer comparison over the two entity tables,
co-partitioned by a shared hash bucket, with one vectorized pandas
outer merge per partition (never row-at-a-time Python).

Two key modes:

- default: join on ``entity_id`` — the env-prefixed physical id, for
  two snapshots of the SAME ``GraphEnvironment`` (equal entities land
  in equal stored buckets, so the diff reuses the build's partitioning
  with zero extra shuffle);
- ``relative=True``: join on ``relative_id`` = md5 of ``{type}/{name}``
  with the environment prefix STRIPPED — the reference's
  ``relative_id_calculator.py:1-7`` analog — so snapshots built under
  two different ``GraphEnvironment``s can be compared. Rows are
  rebucketed on the relative id (the stored bucket derives from the
  env-prefixed id and would differ between environments).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..ids import hashed_id, id_bucket_array
from ..state.manifest import read_stage

_COLS = ["entity_id", "name", "type", "aliases", "n_mentions", "bucket"]

_OUT_SCHEMA = pa.schema(
    [("entity_id", pa.string()), ("name", pa.string()), ("type", pa.string()),
     ("change", pa.string()), ("n_mentions_old", pa.int64()),
     ("n_mentions_new", pa.int64())]
)


def relative_entity_id(etype: str, name: str) -> str:
    """Environment-independent identity: md5 of the id path with the
    ``GraphEnvironment`` prefix stripped (``relative_id_calculator.py``)."""
    return hashed_id(f"{etype}/{name}")


def entity_diff(
    paths_old: dict[str, str],
    paths_new: dict[str, str],
    relative: bool = False,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """→ ds[(entity_id, name, type, change, n_mentions_old, n_mentions_new)]
    with change ∈ {ADDED, DELETED, MODIFIED} (unchanged rows omitted).
    ``relative=True`` compares across environments (see module doc)."""

    def tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))
            if relative:
                rel = [
                    relative_entity_id(ty, nm)
                    for ty, nm in zip(t["type"].to_pylist(), t["name"].to_pylist())
                ]
                t = t.append_column("_key", pa.array(rel, pa.string()))
                return t.set_column(
                    t.schema.get_field_index("bucket"),
                    "bucket",
                    pa.array(
                        id_bucket_array(np.array(rel, dtype=object), cfg.num_buckets),
                        pa.int32(),
                    ),
                )
            return t.append_column("_key", t["entity_id"])

        return f

    old = read_stage(paths_old["entities"], columns=_COLS).map_batches(
        tag("old"), batch_format="pyarrow"
    )
    new = read_stage(paths_new["entities"], columns=_COLS).map_batches(
        tag("new"), batch_format="pyarrow"
    )

    def diff_partition(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        # alias fingerprint: lists don't merge/compare vectorized — fold
        # each to one string key first
        df["_ak"] = ["\x00".join(a) for a in df["aliases"]]
        cols = ["_key", "entity_id", "name", "type", "n_mentions", "_ak"]
        o = df.loc[df["_side"] == "old", cols]
        n = df.loc[df["_side"] == "new", cols]
        m = o.merge(n, on="_key", how="outer", suffixes=("_o", "_n"), sort=True)
        is_add = m["entity_id_o"].isna()
        is_del = m["entity_id_n"].isna()
        is_mod = (
            ~is_add
            & ~is_del
            & (
                (m["n_mentions_o"] != m["n_mentions_n"])
                | (m["_ak_o"] != m["_ak_n"])
            )
        )
        keep = m[is_add | is_del | is_mod]
        add = keep["entity_id_o"].isna().to_numpy()
        dele = keep["entity_id_n"].isna().to_numpy()
        pick_new = ~dele  # ADDED/MODIFIED report the new row's identity
        out = pd.DataFrame(
            {
                "entity_id": np.where(pick_new, keep["entity_id_n"], keep["entity_id_o"]),
                "name": np.where(pick_new, keep["name_n"], keep["name_o"]),
                "type": np.where(pick_new, keep["type_n"], keep["type_o"]),
                "change": np.where(add, "ADDED", np.where(dele, "DELETED", "MODIFIED")),
                "n_mentions_old": keep["n_mentions_o"].astype("Int64").to_numpy(na_value=None, dtype=object),
                "n_mentions_new": keep["n_mentions_n"].astype("Int64").to_numpy(na_value=None, dtype=object),
            }
        )
        return pa.Table.from_pandas(out, schema=_OUT_SCHEMA, preserve_index=False)

    return old.union(new).groupby("bucket").map_groups(diff_partition, batch_format="pyarrow")
