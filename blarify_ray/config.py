"""Pipeline configuration.

Mirrors the knobs the reference exposes (file-size cap at
``blarify/project_file_explorer/project_files_iterator.py:21`` → ``max_html_bytes``;
LSP pool sizing at ``blarify/code_references/lsp_helper.py:97-191`` →
``ner_concurrency``; Neo4j write batches at
``blarify/repositories/graph_db_manager/neo4j_manager.py:96-113`` →
``num_buckets`` partitioned-parquet sink) re-expressed as Ray Data stage
parameters.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class GraphEnvironment:
    """Analog of blarify's GraphEnvironment (graph_environment.py:7-14):
    the id-prefix scoping every node."""

    environment: str = "prod"
    diff_identifier: str = "main"

    @property
    def prefix(self) -> str:
        return f"/{self.environment}/{self.diff_identifier}"


@dataclass(frozen=True)
class PipelineConfig:
    env: GraphEnvironment = field(default_factory=GraphEnvironment)

    # Reference caps file size at 0.8 MB (project_files_iterator.py:21,96).
    # Oversized pages are dropped with a metric, never silently truncated.
    max_html_bytes: int = 800_000

    # Languages with extraction rules; others pass through as RAW rows
    # (cf. FallbackDefinitions, tree_sitter_helper.py:83-91).
    supported_langs: tuple[str, ...] = ("en",)

    # Stage batching — sized so batch x concurrency fits worker heap even
    # with large_string text columns.
    extract_batch_size: int = 256
    ner_batch_size: int = 256
    ner_concurrency: int = 4  # actor-pool size for the mention detector

    # MinHash-LSH canonicalization.
    minhash_perms: int = 64
    lsh_bands: int = 32  # 32 bands x 2 rows → P(candidate) ≈ 0.999 at J=0.45
    shingle_k: int = 3
    jaccard_threshold: float = 0.45  # adjacent-letter typos land at J≈0.5
    cc_max_rounds: int = 12  # convergence guard, cf. the reference's
    # stuck-round cycle breaker (bottom_up_batch_processor.py:224-238)

    # Salting for hot keys (north_rule skew requirement).
    salt_buckets: int = 16

    # Output layout: hash partitions by entity-id bucket.
    num_buckets: int = 16


DEFAULT_CONFIG = PipelineConfig()
