"""Operator-parity analytics over the driver's testdata tables — each
query demonstrates one operator family from SURVEY.md §2 as idiomatic
Ray Data, with a DuckDB oracle in ORACLE_SQL for the hash-verified
correctness gate.

QUERIES: name → callable(sf_dir) → Dataset/DataFrame/Table.
ORACLE_SQL: name → equivalent ANSI SQL (column names must match).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}
