"""max_degree cap for wedge-enumeration queries: bounded hub blowup with
an explicit drop metric; cap high enough to bind nothing == exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from blarify_ray.pipelines.analytics_graph import (
    q_copurchase_local_cc,
    q_copurchase_two_hop,
)


def _write_li(tmp_path, orders, parts):
    pq.write_table(
        pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(np.asarray(orders, np.int64)),
                "l_partkey": pa.array(np.asarray(parts, np.int64)),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )


def _df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _hub_graph(tmp_path, n_leaves=2000):
    """Part 0 co-purchased with every leaf (degree n_leaves) + a separate
    4-clique of parts 10^6..10^6+3 (one order) untouched by the hub."""
    orders, parts = [], []
    for i in range(1, n_leaves + 1):
        orders += [i, i]
        parts += [0, i]
    orders += [10**7] * 4
    parts += [10**6, 10**6 + 1, 10**6 + 2, 10**6 + 3]
    _write_li(tmp_path, orders, parts)


def test_two_hop_cap_drops_hub_with_metric(tmp_path, ray_session):
    _hub_graph(tmp_path)
    stats: dict = {}
    got = _df(q_copurchase_two_hop(str(tmp_path), max_degree=100, stats=stats))
    assert stats["dropped_centers"] == 1  # exactly the hub
    # leaf 2-hop paths all run THROUGH the hub → dropped; the clique has
    # no 2-hop-only nodes (everyone is a direct neighbor) → empty result
    assert len(got) == 0


def test_two_hop_cap_not_binding_is_exact(tmp_path, ray_session):
    _hub_graph(tmp_path, n_leaves=30)
    stats: dict = {}
    capped = _df(q_copurchase_two_hop(str(tmp_path), max_degree=1000, stats=stats))
    exact = _df(q_copurchase_two_hop(str(tmp_path)))
    cols = ["node", "n_two_hop"]
    pd.testing.assert_frame_equal(
        capped[cols].sort_values(cols).reset_index(drop=True),
        exact[cols].sort_values(cols).reset_index(drop=True),
    )
    assert stats["dropped_centers"] == 0
    # sanity: each leaf sees the other 29 leaves at exactly two hops
    assert set(exact[exact["node"] == 1]["n_two_hop"]) == {29}


def test_local_cc_cap_drops_hub_keeps_clique(tmp_path, ray_session):
    _hub_graph(tmp_path)
    stats: dict = {}
    got = _df(q_copurchase_local_cc(str(tmp_path), max_degree=100, stats=stats))
    assert stats["dropped_centers"] == 1
    # the hub emits NO row (dropped, never a wrong cc)
    assert 0 not in set(got["node"])
    # the clique nodes keep exact cc = 1.0
    clique = got[got["node"] >= 10**6]
    assert len(clique) == 4 and np.allclose(clique["local_cc"], 1.0)
    # leaves keep their row: degree 1 under the cap → cc 0
    leaf = got[got["node"] == 1]
    assert len(leaf) == 1 and float(leaf["local_cc"].iloc[0]) == 0.0
