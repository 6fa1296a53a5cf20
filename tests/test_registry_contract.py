"""Driver-contract invariants: the round driver records at most ~50
CORRECTNESS entries in registry order, so every DuckDB-oracle-backed
query MUST enumerate before the rows-only kg/training entries — a
reordering regression would silently drop the hard correctness signal.
Also: every oracle key has a runnable query, and names are unique
across registries."""

import importlib.util
import pathlib

_ENTRY = str(pathlib.Path(__file__).resolve().parents[1] / "__ray_entry__.py")


def _entry_module():
    spec = importlib.util.spec_from_file_location("__ray_entry__", _ENTRY)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_oracle_queries_enumerate_first():
    m = _entry_module()
    q = list(m.queries())
    oracle = set(m.oracle_sql())
    assert oracle <= set(q)
    first = q[: len(oracle)]
    assert set(first) == oracle, (
        "oracle-backed queries must occupy the first positions of the "
        "registry (driver snapshot cap)"
    )


def test_registry_shapes():
    m = _entry_module()
    q = m.queries()
    o = m.oracle_sql()
    assert len(q) == len(set(q)) and len(q) >= 100
    assert len(o) >= 69
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
    # kg entries exist and come after the oracle block
    kg = [k for k in q if k.startswith("kg_")]
    assert len(kg) >= 25
    order = list(q)
    assert min(order.index(k) for k in kg) >= len(o)
