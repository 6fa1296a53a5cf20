"""Explicit Arrow schemas for every logical table (SURVEY.md §1.3).

The reference keeps schema implicit (dict rows built in
``blarify/graph/node/types/node.py:74-89``); here every stage boundary is
a typed ``pyarrow`` schema so blocks stay zero-copy Arrow end-to-end.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# S1 output — one row per surviving page (latest crawl, size-capped).
DOCS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.large_string()),
        ("text_sha", pa.binary()),  # sha256 of text — byte-identity check
        ("raw", pa.bool_()),  # unsupported lang → RAW passthrough
        ("n_sents", pa.int32()),
    ]
)

MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
        ("ner_type", pa.string()),  # ORG/PERSON/PLACE/PRODUCT/AMBIG/UNK
    ]
)

TRIPLES_RAW = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("subj_start", pa.int32()),
        ("obj_start", pa.int32()),
        ("rule_id", pa.string()),
    ]
)

# After linking: surfaces resolved to canonical names where the alias
# dictionary + page context suffice; unresolved carry resolved=False and a
# normalized surface key for canonicalization.
TRIPLES_LINKED = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("subj_key", pa.string()),  # canonical name or norm surface
        ("subj_type", pa.string()),
        ("subj_resolved", pa.bool_()),
        ("pred", pa.string()),
        ("obj_key", pa.string()),
        ("obj_type", pa.string()),
        ("obj_resolved", pa.bool_()),
    ]
)

# Fused S2–S4 output: one row per mention, with the resolution result and
# — when this mention is the SUBJECT of an extracted triple — the triple
# annotation embedded (pred + object-mention resolution). One stage, one
# schema; triples are a vectorized projection of this table, so the
# expensive NER/link pass runs exactly once.
MENTIONS_RESOLVED = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
        ("ner_type", pa.string()),
        ("key", pa.string()),
        ("etype", pa.string()),
        ("resolved", pa.bool_()),
        ("pred", pa.string()),  # null unless subject of a triple
        ("obj_key", pa.string()),
        ("obj_type", pa.string()),
        ("obj_resolved", pa.bool_()),
        ("obj_start", pa.int32()),
        # evidence snippet of the triple's sentence (null unless subject
        # of a triple) — becomes the edge's scope_text provenance, the
        # Relationship.scope_text analog (relationship.py:8-33)
        ("sent_text", pa.string()),
    ]
)

ENTITIES = pa.schema(
    [
        ("entity_id", pa.string()),  # md5 hex of env-prefixed logical id
        ("name", pa.string()),
        ("type", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("n_mentions", pa.int64()),
        ("bucket", pa.int32()),
    ]
)

EDGES = pa.schema(
    [
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("pred", pa.string()),
        ("scope_text", pa.string()),
        ("url", pa.string()),  # provenance: first (url, sent_id)
        ("sent_id", pa.int32()),
        ("weight", pa.int64()),
        ("bucket", pa.int32()),
    ]
)
