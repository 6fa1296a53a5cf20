"""Swappable graph sinks — the ``AbstractDbManager`` contract
(``blarify/repositories/graph_db_manager/db_manager.py:12-88``) with two
implementations, mirroring the reference's Neo4j/FalkorDB pair:

- ParquetSink: sorted hash-partitioned parquet (the default; idempotent
  by deterministic ids + atomic partition replace ≅ MERGE upsert,
  ``neo4j_manager.py:83-197``)
- JsonlSink:   newline-delimited JSON (debug/export; ≅ the alternate
  backend ``falkordb_manager.py``)
"""

from __future__ import annotations

import abc
import os

import ray.data


class GraphSink(abc.ABC):
    """save_nodes/save_edges replace the reference's create_nodes /
    create_edges batched-upsert pair."""

    @abc.abstractmethod
    def save_nodes(self, entities: ray.data.Dataset, path: str) -> None: ...

    @abc.abstractmethod
    def save_edges(self, edges: ray.data.Dataset, path: str) -> None: ...


class ParquetSink(GraphSink):
    def __init__(self, partition_col: str = "bucket"):
        self.partition_col = partition_col

    def save_nodes(self, entities: ray.data.Dataset, path: str) -> None:
        entities.sort([self.partition_col, "entity_id"]).write_parquet(
            path, partition_cols=[self.partition_col]
        )

    def save_edges(self, edges: ray.data.Dataset, path: str) -> None:
        edges.sort([self.partition_col, "src_id", "pred", "dst_id"]).write_parquet(
            path, partition_cols=[self.partition_col]
        )


class JsonlSink(GraphSink):
    def save_nodes(self, entities: ray.data.Dataset, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        entities.write_json(path)

    def save_edges(self, edges: ray.data.Dataset, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        edges.write_json(path)


SINKS = {"parquet": ParquetSink, "jsonl": JsonlSink}
