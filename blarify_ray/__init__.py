"""blarify_ray — a Ray-Data-native knowledge-graph construction engine.

Re-creates the query/data-processing capabilities of blarApp/blarify
(reference at /root/reference, studied for WHAT it computes) over
Common-Crawl-style web pages: HTML→text extraction, mention detection,
triple extraction, entity linking, MinHash-LSH + union-find
canonicalization, and sorted/hash-partitioned node & edge Parquet output.

Architecture is idiomatic Ray Data: ``ray.data.Dataset`` pipelines of
Arrow blocks, ``map_batches`` (actor pools for stateful stages),
groupby/sort shuffles with explicit salting, streaming execution.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
driver, bench.py and the test fixture own the Ray session.
"""

__version__ = "0.1.0"
