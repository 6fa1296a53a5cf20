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

import enum
from dataclasses import dataclass, field


class ResolverMode(str, enum.Enum):
    """How unresolved-surface candidate pairs are scored during
    canonicalization (the reference's resolver-mode switch between the
    alias dictionary and the embedding-based linker):

    - JACCARD: exact char-shingle Jaccard (the default spec scorer)
    - EMBEDDING: cosine over deterministic feature-hashed shingle
      embeddings (the offline stand-in for a learned embedding scorer —
      same interface, swappable model)
    - AUTO: the fallback chain (reference HybridResolver,
      ``blarify/code_references/hybrid_resolver.py:20-27,71-116`` —
      SCIP dictionary first, LSP/model per-surface fallback): a pair the
      Jaccard scorer accepts uses the dictionary score and ALWAYS
      outranks embedding-only pairs in the per-surface attachment argmax
      (encoded as ``1 + jaccard``); a pair the dictionary rejects falls
      back to the embedding cosine and is kept when it clears
      ``embed_link_threshold``.
    """

    JACCARD = "jaccard"
    EMBEDDING = "embedding"
    AUTO = "auto"


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
    ner_concurrency: int = 16  # actor-pool size for the mention detector
    # (util.pool_size caps it at half the cluster CPUs at runtime)
    # The NER stage's only state (the Gazetteer) is read-only broadcast
    # data, so by default it runs as stateless TASKS with a per-worker
    # cache: every CPU participates (an actor pool is capped at half the
    # cluster to avoid the streaming-executor livelock) and pre-warmed
    # workers skip the per-build pool spin-up. The actor-pool tier
    # (ner_stateless=False) remains for genuinely mutable/heavy state and
    # is forced-tier tested to produce identical output.
    ner_stateless: bool = True

    # partition count for partition-level groupby fns (hash the group key
    # into this many Ray-level groups; vectorized aggregation inside)
    agg_partitions: int = 64

    # latest-crawl-wins dedup tier: while the CONTESTED-url map (urls
    # with >1 crawl → max warc_ts) stays under this size it is computed
    # from a PRUNED (url, ts) scan and broadcast as a filter — the heavy
    # extracted-text column then never shuffles at all. Above it, the
    # hash-partitioned post-extract shuffle dedup takes over.
    dedup_broadcast_max: int = 2_000_000

    # Canonicalization pair scorer (ResolverMode) + per-mode thresholds.
    resolver_mode: ResolverMode = ResolverMode.JACCARD
    embed_link_threshold: float = 0.6  # cosine cut for EMBEDDING mode

    # MinHash-LSH canonicalization.
    minhash_perms: int = 64
    lsh_bands: int = 32  # 32 bands x 2 rows → P(candidate) ≈ 0.999 at J=0.45
    shingle_k: int = 3
    jaccard_threshold: float = 0.45  # adjacent-letter typos land at J≈0.5
    cc_max_rounds: int = 12  # convergence guard, cf. the reference's
    # stuck-round cycle breaker (bottom_up_batch_processor.py:224-238)
    # below this many EMITTED verified pairs (int32 triples — includes
    # cross-partition duplicates, so the distinct set is several× smaller),
    # the argmax attachment + union-find run on the driver (the guide's
    # "provably small" case: 20M int rows ≈ 320 MB pandas); above it, the
    # distributed partial-argmax + min-label-propagation path takes over
    cc_driver_max_pairs: int = 20_000_000
    # below this many DISTINCT unresolved norms the whole canonicalization
    # runs on the driver via the serial spec (identical output by
    # definition — canonical.canonicalize_surfaces IS the spec), skipping
    # 3+ entity-scale shuffle executions per build; above it the
    # distributed LSH/verify/cluster stages take over. The threshold is
    # where the driver's single-threaded pair verification (~0.5 ms/norm)
    # stops being cheaper than the distributed path's fixed orchestration
    # latency — pair enumeration is quadratic-ish in norms-per-bucket, so
    # large sets MUST parallelize (Amdahl: serial driver seconds depress
    # the measured N-vs-4N scaling efficiency directly).
    canon_driver_max_norms: int = 8_192
    # above this many canonical-map entries the S6 resolve stops
    # broadcasting a driver dict (which every worker would hold) and
    # switches to a hash-co-partitioned lookup join against the
    # canonical table — the open-vocabulary path where the map itself is
    # sharded and never materializes on one machine.
    canon_broadcast_max: int = 2_000_000
    # gazetteer tier: at or below this many entities the alias dictionary
    # broadcasts (`ray.put` once, worker-cached Gazetteer — the default);
    # above it the dictionary is hive-sharded by first-token hash
    # (`stages/gazetteer_shards.py`) and workers LRU-load only the shards
    # their pages' vocabulary probes — dictionary growth costs disk, not
    # per-worker broadcast RAM. Both tiers match identically (forced-tier
    # e2e test).
    gazetteer_broadcast_max: int = 50_000_000
    gazetteer_shards: int = 16
    # doc-layer vector search tier: at or below this many doc-layer rows
    # a query brute-force scans the checkpoint (exact, zero extra
    # state); above it `ensure_doc_ann` maintains an IVF hive layout
    # next to the layer and queries read ONLY the probed centroid dirs
    # — entity-scale × high-dim search must not re-scan the corpus per
    # query. `doc_ann_nprobe >= doc_ann_cells` degrades the ANN tier to
    # exact brute force (the parity-test lever).
    doc_search_brute_max: int = 200_000
    doc_ann_cells: int = 64
    doc_ann_nprobe: int = 8
    # near-dup candidate tier: below this many candidate PAIRS the
    # distinct candidate-id set is pulled to the driver once and
    # broadcast as a sorted array (vectorized ``pc.is_in`` prune);
    # above it the id set is derived distributed and items are pruned
    # by a co-partitioned semi-join — the pair table never
    # materializes on the driver. Both tiers produce identical output
    # (forced-tier tested).
    dedup_candidate_broadcast_max: int = 5_000_000
    # connected-components exchange width: partitions per round =
    # clamp(rows / cc_rows_per_partition, 1, agg_partitions). Every
    # ``map_groups`` emits one block per group, so a fixed 64-way
    # exchange over an entity-scale label table floods later rounds
    # with tiny blocks; scaling the width with the data keeps local
    # runs at 1–2 partitions and cluster-scale runs at full fan-out.
    cc_rows_per_partition: int = 100_000
    # workflow discovery (DFS from entry points): below this many edges
    # the adjacency fits comfortably on the driver and the recursive DFS
    # runs in-process; above it the iterative frontier-join DFS takes
    # over — path-row datasets extended one hop per round via a
    # co-partitioned adjacency join, with an EXACT per-entry
    # lexicographic top-k prune each round (completed ∪ active paths
    # form a prefix-free antichain, so pruning past rank k can never
    # drop a top-k completion). Both tiers produce identical rows
    # (forced-tier tested).
    workflows_driver_max_edges: int = 2_000_000
    # PageRank tier: below this many edges the power iteration runs on
    # the driver as one numpy bincount per round (same driver bound as
    # the workflows DFS); above it each round is a co-partitioned
    # rank⋈edges attach + hash-routed vectorized sum over a partitioned
    # node-state dataset. Identical spec both tiers (forced-tier tested
    # to float-summation-order tolerance).
    pagerank_driver_max_edges: int = 2_000_000
    # ... and below this many NODES: the driver tier pulls the entities
    # table via take_all, so an entity-heavy/edge-sparse KG (many
    # isolated nodes) must not select it on edge count alone.
    pagerank_driver_max_nodes: int = 4_000_000
    # Label-propagation communities tier: same driver bounds as
    # PageRank (the driver round is one np.unique + lexsort argmax);
    # above either bound each synchronous round is a co-partitioned
    # label⋈edges attach + (node, label) weight-sum exchange +
    # vectorized per-node argmax. Weights are int64, so tie-breaks
    # (max weight, then lexicographically smallest label) are EXACT and
    # the tiers are bit-identical (forced-tier tested).
    lpa_driver_max_edges: int = 2_000_000
    lpa_driver_max_nodes: int = 4_000_000
    # HyperBall (harmonic centrality / reach / distance distribution):
    # below both bounds the whole (n × 2^b) register matrix lives on the
    # driver and a round is one np.maximum.at; above, registers are a
    # hash-partitioned blob dataset and a round is a co-partitioned
    # counter⋈edges attach + node-keyed register-max exchange. Register
    # max is order-independent, so per-node outputs are bit-identical
    # across tiers (forced-tier tested). The node bound is tighter than
    # PageRank's because driver state is 2^b bytes/node, not 8.
    hyperball_driver_max_edges: int = 2_000_000
    hyperball_driver_max_nodes: int = 500_000
    # k-hop frontier tier: a frontier (plus seen set) smaller than this
    # is broadcast as a sorted id array and applied with ``pc.is_in``;
    # above it the expansion switches to a co-partitioned semi-join of
    # the edge table against a frontier dataset (hub-node safety: the
    # frontier never has to fit on the driver).
    khop_broadcast_max: int = 1_000_000
    # Whole-graph algorithm tier (triangle counting, k-core): below this
    # many deduplicated undirected edges the algorithm runs on the driver
    # in vectorized pandas/numpy (bucketed so the wedge self-merge never
    # materializes all wedges at once); above it the same plan runs as
    # co-partitioned exchanges over edge/degree datasets. Identical
    # output both tiers (forced-tier tested).
    graph_driver_max_edges: int = 500_000

    # hot-bucket guard (skew handling): an LSH bucket with more members
    # than this is skipped entirely — deterministic, applied identically
    # by the serial spec and the distributed stage. A near-dup pair
    # shares many of the 32 bands, so losing its hottest buckets rarely
    # loses the pair; it only bounds the quadratic enumeration.
    max_lsh_bucket: int = 100

    # Skew/hot-key handling has no separate salting knob: it is delivered
    # by (a) per-batch partial aggregation — the hot entity reaches the
    # shuffle as ≤1 row per upstream batch, not one row per mention
    # (stages/materialize.py), and (b) the max_lsh_bucket hot-bucket cap
    # above. An explicit salt column would only re-split what the
    # partials already collapsed.

    # Output layout: hash partitions by entity-id bucket.
    num_buckets: int = 16


DEFAULT_CONFIG = PipelineConfig()
