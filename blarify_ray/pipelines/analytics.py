"""Operator-parity analytics over the driver's testdata tables — each
query demonstrates one operator family from SURVEY.md §2 as idiomatic
Ray Data, with a DuckDB oracle in ORACLE_SQL for the hash-verified
correctness gate (column names and dtypes match the SQL exactly).

Money/float aggregates are carried as integer cents
(``CAST(ROUND(x*100) AS BIGINT)``) so sums are order-independent and
hash-stable across engines; regex character classes are spelled out in
ASCII so Python ``re`` and DuckDB RE2 agree.

Operator coverage ↔ reference analog:
- pricing_summary          groupby-aggregate w/ derived cols (Graph label index, graph.py:37-47)
- top_customer_revenue     agg + broadcast dim join + global top-k (project_files_stats.py:22-33)
- users_without_purchase   anti-join via broadcast key set (entry-point discovery, queries.py:1692-1701)
- doc_stats_top10          full-scan stats + sort desc + limit (ProjectFileStats, project_files_stats.py:7-52)
- latest_event_per_user    latest-wins dedup / argmax per key (incremental update, graph_builder.py:138-225)
- events_hourly            tumbling window groupby (SURVEY §2.8 mapping)
- sessionize_users         gap-based session windows via map_groups (ordered per-key fold, queries.py:1329-1374)
- exact_dedup_docs         content-hash dedup (embedding dedup aggregate, embedding_service.py:97-144)
- token_counts             per-row text metrics (complexity stats, stats/complexity.py:23-82)
- char_class_stats         per-row scalar UDFs (path/id scalar fns, utils/path_calculator.py)
- vector_topk              brute-force cosine top-k (vector search, queries.py:2298-2356)
- grep_docs                predicate scan + groupby (grep text, queries.py:1746-1849)
- order_priority_revenue   large-large hash join (reference resolution join, scip_helper.py:748-835)
- topk_docs_per_source     per-group top-k (per-file top-5 counts, project_graph_creator.py:206-237)
- distinct_users_per_type  two-level distinct aggregate (seen-set dedup, queries.py:1380-1417)
- nation_rollup            chained broadcast dim joins (blame attribution join shape)
- orders_blame_window      most-specific containing range (relationship_creator.py:320-378)
- running_revenue_per_user partitioned window function (ordered per-key fold, §2.8)
- top_suppliers_by_revenue broadcast dim join + per-batch bincount partials + top-k
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


ROUTE_PARTS = 64


def _route(df: pd.DataFrame, col: str, parts: int = ROUTE_PARTS) -> pd.DataFrame:
    """Attach the hash-partition key for the per-batch-partial →
    ``groupby("_pkey").map_groups(merge)`` aggregation pattern (ONE
    Python call per hash partition, vectorized merge inside — see
    CLAUDE.md). Shared by every battery module; changing the routing
    hash here keeps all batteries partitioning identically."""
    # shallow copy: callers often pass a filtered/dedup'd view — adding
    # the key column to it would raise SettingWithCopyWarning. No column
    # data is duplicated.
    df = df.copy(deep=False)
    df["_pkey"] = (
        pd.util.hash_array(df[col].to_numpy()) % parts
    ).astype("int32")
    return df


def _round_half_away(v: np.ndarray) -> np.ndarray:
    """DuckDB ROUND semantics: half away from zero (numpy's rint is
    half-to-even — off by one on exact .5 values, which cents*discount
    products hit often)."""
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """CAST(ROUND(x*100) AS BIGINT), vectorized."""
    np_vals = np.asarray(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr, dtype=np.float64)
    return pa.array(_round_half_away(np_vals * 100))


# --- pricing_summary -------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        ext = np.asarray(t["l_extendedprice"].combine_chunks(), dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks(), dtype=np.float64)
        qty = np.asarray(t["l_quantity"].combine_chunks(), dtype=np.float64)
        return pa.Table.from_pydict(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                # half-away-from-zero like the oracle's ROUND (Arrow's
                # pc.round is half-to-even — diverges on fractional .5)
                "qty": pa.array(_round_half_away(qty)),
                "base_cents": pa.array(_round_half_away(ext * 100)),
                "disc_cents": pa.array(_round_half_away(ext * (1 - disc) * 100)),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

# --- top_customer_revenue --------------------------------------------------

def q_top_customer_revenue(sf_dir: str):
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        )

    from ray.data.aggregate import Sum

    rev = orders.map_batches(derive, batch_format="pyarrow").groupby("o_custkey").aggregate(
        Sum("cents", alias_name="revenue_cents")
    )
    # top-10 FIRST, names after: the dimension table is never read on the
    # driver and never broadcast — the final k keys prune one distributed
    # customer scan (``pc.is_in`` over a k-element array), so this shape
    # holds at any customer-table scale
    top = (
        rev.sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(10)
        .to_pandas()  # result-scale (k rows)
    )
    key_arr = pa.array(top["o_custkey"].to_numpy(np.int64), pa.int64())
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    hits = cust.map_batches(
        lambda t, _k=key_arr: t.filter(pc.is_in(t["c_custkey"], value_set=_k)),
        batch_format="pyarrow",
    ).take_all()  # ≤ k rows
    names = {r["c_custkey"]: r["c_name"] for r in hits}
    return pd.DataFrame(
        {
            "c_custkey": top["o_custkey"].to_numpy(np.int64),
            "c_name": [names[k] for k in top["o_custkey"]],
            "revenue_cents": top["revenue_cents"].to_numpy(np.int64),
        }
    )


SQL_TOP_CUSTOMER = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue_cents DESC, c_custkey LIMIT 10
"""

# --- users_without_purchase (anti-join) -----------------------------------

def q_users_without_purchase(sf_dir: str):
    """Anti-join via a DISTRIBUTED buyer derivation + broadcast key set:
    users that never made a purchase over 300 (entry-point-discovery
    shape). The fact table is scanned distributed both times — a
    per-batch unique partial collapses the buyer side to key-scale before
    the global distinct, and the resulting small key array is broadcast
    (``ray.put``) and applied with vectorized ``pc.is_in`` + ``invert``.
    No driver read of a fact table, no per-row Python."""
    import ray as _ray

    from ..util import get_broadcast

    ev = _t(sf_dir, "events", ["user_id", "event_type"])
    evv = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def buyer_partial(t: pa.Table) -> pa.Table:
        big = pc.and_(
            pc.equal(t["event_type"], "purchase"), pc.greater(t["value"], 300.0)
        )
        return pa.Table.from_pydict({"user_id": pc.unique(t.filter(big)["user_id"])})

    buyers_rows = (
        evv.map_batches(buyer_partial, batch_format="pyarrow")
        .groupby("user_id")
        .count()
        .select_columns(["user_id"])
        .take_all()
    )  # key-scale (distinct buyers), not fact-scale
    buyers_ref = _ray.put(
        pa.array(sorted(r["user_id"] for r in buyers_rows), pa.int64())
    )

    def anti(t: pa.Table) -> pa.Table:
        val = get_broadcast(buyers_ref)
        mask = pc.invert(pc.is_in(pc.cast(t["user_id"], pa.int64()), value_set=val))
        return t.filter(mask).select(["user_id"])

    from ray.data.aggregate import Count

    return (
        ev.map_batches(anti, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"))
    )


SQL_NO_PURCHASE = """
SELECT user_id, COUNT(*) AS n_events FROM events
WHERE user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300.0)
GROUP BY user_id
"""

# --- doc_stats_top10 -------------------------------------------------------

def q_doc_stats_top10(sf_dir: str):
    """Longest-10 documents by char count (ProjectFileStats analog).

    Scale shape: each batch keeps only its LOCAL top-10 (the sorted
    table is slim but a global sort is still an all-to-all exchange);
    the driver merges k-scale partials — ≤10 rows per block — the same
    combiner pattern as ``topk_docs_per_source``."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def stats_topk(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_chars = np.array([len(x) for x in texts], np.int64)
        n_lines = np.array([x.count("\n") + 1 for x in texts], np.int64)
        did = t["doc_id"].to_numpy()
        order = np.lexsort((did, -n_chars))[:10]  # (n_chars DESC, doc_id ASC)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(did[order], pa.int64()),
                "n_chars": pa.array(n_chars[order], pa.int64()),
                "n_lines": pa.array(n_lines[order], pa.int64()),
            }
        )

    part = docs.map_batches(stats_topk, batch_format="pyarrow").to_pandas()
    return (
        part.sort_values(["n_chars", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )


SQL_DOC_STATS = """
SELECT doc_id, length(text) AS n_chars,
       length(text) - length(replace(text, chr(10), '')) + 1 AS n_lines
FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10
"""

# --- latest_event_per_user -------------------------------------------------

AGG_PARTITIONS = 64


def _with_pkey(df, col: str, parts: int = AGG_PARTITIONS):
    """Deterministic partition-routing key (never observable in output)."""
    import pandas as pd

    df["_pkey"] = (pd.util.hash_array(df[col].to_numpy()) % parts).astype("int32")
    return df


def q_latest_event_per_user(sf_dir: str):
    """argmax per key, partition-level: a per-batch PARTIAL keeps the max
    (ts, event_id) row per user inside each batch, then ONE shuffle
    grouped by hash(user_id) % 64 with a vectorized pandas merge — never
    one Python call per user (the dedup_latest pattern)."""
    import pandas as pd

    ev = _t(sf_dir, "events", ["user_id", "event_id", "ts"])

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return df.drop_duplicates("user_id", keep="last")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _with_pkey(keep_latest(df), "user_id")

    def merge(g: pd.DataFrame) -> pa.Table:
        g = keep_latest(g)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(g["user_id"].astype("int64")),
                "event_id": pa.array(g["event_id"].astype("int64")),
                "ts": pa.array(g["ts"].astype("datetime64[us]")),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


SQL_LATEST_EVENT = """
SELECT user_id, event_id, ts FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""

# --- events_hourly ---------------------------------------------------------

def q_events_hourly(sf_dir: str):
    ev = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "event_type": t["event_type"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "value_cents": _cents(t["value"]),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        ev.map_batches(derive, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
    )


SQL_EVENTS_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""

# --- sessionize_users ------------------------------------------------------

SESSION_GAP_S = 1800


def q_sessionize_users(sf_dir: str):
    """Gap-based session counting, partition-level: users are
    hash-routed into 64 Ray-level groups; inside each group one
    vectorized pandas groupby computes per-user gaps — never one Python
    call per user. (No pre-aggregation is possible: the gap rule needs
    every event of a user together; the full event rows shuffle once,
    which is inherent to the operator.)"""
    import pandas as pd

    ev = _t(sf_dir, "events", ["user_id", "event_id", "ts"])

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        return _with_pkey(df, "user_id")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds()
        out = (
            g.assign(_new=(gaps > SESSION_GAP_S))
            .groupby("user_id", sort=True)
            .agg(n_events=("user_id", "size"), n_sessions=("_new", "sum"))
            .reset_index()
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["n_sessions"] = out["n_sessions"].astype("int64") + 1
        return out[["user_id", "n_events", "n_sessions"]]

    return (
        ev.map_batches(add_pkey, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(sessions, batch_format="pandas")
    )


SQL_SESSIONIZE = f"""
SELECT user_id, COUNT(*) AS n_events,
       CAST(1 + SUM(CASE WHEN prev_ts IS NOT NULL
                     AND epoch(ts) - epoch(prev_ts) > {SESSION_GAP_S}
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
) GROUP BY user_id
"""

# --- exact_dedup_docs ------------------------------------------------------

def q_exact_dedup_docs(sf_dir: str):
    import hashlib

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "text_md5": pa.array(
                    [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()],
                    pa.string(),
                ),
                "doc_id": t["doc_id"],
            }
        )

    from ray.data.aggregate import Count, Min

    return (
        docs.map_batches(h, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_copies"))
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

# --- token_counts ----------------------------------------------------------

_WS_SPLIT = re.compile(r"[ \t\n]+")
_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^ \t\nA-Za-z0-9]")


def q_token_counts(sf_dir: str):
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pa.array(
                    [len(_WS_SPLIT.split(x.strip(" \t\n"))) for x in texts], pa.int64()
                ),
                "n_bpeish_tokens": pa.array([len(_BPEISH.findall(x)) for x in texts], pa.int64()),
            }
        )

    return docs.map_batches(toks, batch_format="pyarrow")


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10)), '[ \t\n]+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^ \t\nA-Za-z0-9]')) AS n_bpeish_tokens
FROM documents
"""

# --- char_class_stats ------------------------------------------------------

_ALPHA = re.compile(r"[^A-Za-z]")
_DIGIT = re.compile(r"[^0-9]")


def q_char_class_stats(sf_dir: str):
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
                "n_alpha": pa.array([len(_ALPHA.sub("", x)) for x in texts], pa.int64()),
                "n_digit": pa.array([len(_DIGIT.sub("", x)) for x in texts], pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


SQL_CHAR_CLASS = """
SELECT doc_id, length(text) AS n_chars,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
FROM documents
"""

# --- vector_topk -----------------------------------------------------------

def q_vector_topk(sf_dir: str):
    """Brute-force cosine top-10 against the vec_id=0 query vector.

    Scale shape: the query vector comes from a FILTERED parquet read
    (row-group predicate pushdown — never a full-table driver load);
    each batch computes similarities on the zero-copy FixedSizeList→
    ndarray view and keeps only its LOCAL top-10, so the driver merges
    k-scale partials (≤10 rows per block) instead of sorting the whole
    corpus through an all-to-all exchange."""
    from ..ops.similarity import _mat

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding"],
        filters=[("vec_id", "==", 0)],
    )
    qvec = _mat(qtbl["embedding"])[0]
    qn = qvec / np.linalg.norm(qvec)

    def topk_partial(t: pa.Table) -> pa.Table:
        m = _mat(t["embedding"])
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ qn) / np.where(norms == 0, 1, norms)
        vid = t["vec_id"].to_numpy()
        order = np.lexsort((vid, -sims))[:10]  # (s DESC, vec_id ASC)
        return pa.Table.from_pydict(
            {"vec_id": pa.array(vid[order], pa.int64()), "s": pa.array(sims[order])}
        )

    part = emb.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    part = part.sort_values(
        ["s", "vec_id"], ascending=[False, True], kind="mergesort"
    ).head(10)
    return pd.DataFrame({"vec_id": part["vec_id"].to_numpy(np.int64)})


SQL_VECTOR_TOPK = """
SELECT vec_id FROM (
  SELECT vec_id,
         list_cosine_similarity(embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS s
  FROM embeddings
) ORDER BY s DESC, vec_id LIMIT 10
"""

# --- grep_docs -------------------------------------------------------------

GREP_PATTERN = "data"


def q_grep_docs(sf_dir: str):
    docs = _t(sf_dir, "documents", ["source", "text"])

    def grep(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t["text"], GREP_PATTERN)).select(["source"])

    from ray.data.aggregate import Count

    return docs.map_batches(grep, batch_format="pyarrow").groupby("source").aggregate(
        Count(alias_name="n_matching")
    )


SQL_GREP = f"""
SELECT source, COUNT(*) AS n_matching FROM documents
WHERE contains(text, '{GREP_PATTERN}') GROUP BY source
"""

# --- order_priority_revenue (large-large hash join) ------------------------

# below this many dim rows the join side is broadcast (sorted key array +
# int8 codes, a few MB per million rows) and the fact scan does a
# map-side join + per-batch partial aggregate — the fact table never
# shuffles. Above it, the hash-partitioned Dataset.join takes over with
# partitions scaled to the cluster.
JOIN_BROADCAST_MAX = 5_000_000


def q_order_priority_revenue(sf_dir: str):
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    from ray.data.aggregate import Count, Sum

    n_orders = orders.count()  # parquet metadata count — no scan
    if n_orders <= JOIN_BROADCAST_MAX:
        import ray as _ray

        from ..util import get_broadcast

        ot = orders.to_pandas()
        okeys = ot["o_orderkey"].to_numpy(np.int64)
        cats, codes = np.unique(ot["o_orderpriority"].to_numpy(), return_inverse=True)
        srt = np.argsort(okeys, kind="mergesort")
        dim_ref = _ray.put((okeys[srt], codes[srt].astype(np.int16), list(cats)))

        def attach_partial(t: pa.Table) -> pa.Table:
            ks, cs, cat_names = get_broadcast(dim_ref)
            lk = np.asarray(t["l_orderkey"].combine_chunks(), dtype=np.int64)
            pos = np.searchsorted(ks, lk)
            pos_c = np.clip(pos, 0, len(ks) - 1)
            hit = ks[pos_c] == lk  # inner-join semantics
            ext = np.asarray(t["l_extendedprice"].combine_chunks(), dtype=np.float64)[hit]
            disc = np.asarray(t["l_discount"].combine_chunks(), dtype=np.float64)[hit]
            code = cs[pos_c[hit]]
            rev = _round_half_away(ext * (1 - disc) * 100)
            nb = len(cat_names)
            cnt = np.bincount(code, minlength=nb).astype(np.int64)
            # inner-join semantics: a priority with zero matching items in
            # this batch emits NO row (and, summed globally, none at all) —
            # identical to the SQL oracle and the Dataset.join tier
            nz = cnt > 0
            return pa.Table.from_pydict(
                {
                    "o_orderpriority": pa.array(
                        [cat_names[i] for i in np.flatnonzero(nz)], pa.string()
                    ),
                    "revenue_cents": pa.array(
                        np.bincount(code, weights=rev, minlength=nb).astype(np.int64)[nz]
                    ),
                    "n_items": pa.array(cnt[nz]),
                }
            )

        return li.map_batches(attach_partial, batch_format="pyarrow").groupby(
            "o_orderpriority"
        ).aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_items", alias_name="n_items"),
        )

    def derive(t: pa.Table) -> pa.Table:
        ext = np.asarray(t["l_extendedprice"].combine_chunks(), dtype=np.float64)
        disc = np.asarray(t["l_discount"].combine_chunks(), dtype=np.float64)
        return pa.Table.from_pydict(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_cents": pa.array(_round_half_away(ext * (1 - disc) * 100)),
            }
        )

    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    li2 = li.map_batches(derive, batch_format="pyarrow")
    joined = li2.join(
        orders, join_type="inner",
        num_partitions=max(8, cpus * 2),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    return joined.groupby("o_orderpriority").aggregate(
        Sum("rev_cents", alias_name="revenue_cents"), Count(alias_name="n_items")
    )


SQL_ORDER_PRIORITY = """
SELECT o_orderpriority,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

# --- topk_docs_per_source --------------------------------------------------

def q_topk_docs_per_source(sf_dir: str):
    docs = _t(sf_dir, "documents", ["source", "doc_id", "n_chars"])

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        return g.take(idx[:3])

    return docs.groupby("source").map_groups(topk, batch_format="pyarrow")


SQL_TOPK_PER_SOURCE = """
SELECT source, doc_id, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 3
"""

# --- distinct_users_per_type -----------------------------------------------

def q_distinct_users_per_type(sf_dir: str):
    ev = _t(sf_dir, "events", ["event_type", "user_id"])
    from ray.data.aggregate import Count

    pairs = ev.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_c"))
    return pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))


SQL_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""

# --- nation_rollup ---------------------------------------------------------

def q_nation_rollup(sf_dir: str):
    cust = _t(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))

    def attach(t: pa.Table) -> pa.Table:
        rname = [r2name[n2r[k]] for k in t["c_nationkey"].to_pylist()]
        return pa.Table.from_pydict(
            {"r_name": pa.array(rname, pa.string()), "acctbal_cents": _cents(t["c_acctbal"])}
        )

    from ray.data.aggregate import Count, Sum

    return cust.map_batches(attach, batch_format="pyarrow").groupby("r_name").aggregate(
        Count(alias_name="n_customers"), Sum("acctbal_cents", alias_name="acctbal_cents_sum")
    )


SQL_NATION_ROLLUP = """
SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents_sum
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

# --- orders_last_event (as-of join) ----------------------------------------

def q_orders_last_event(sf_dir: str):
    """As-of join: each event ⋈ the user's most recent per-day order
    aggregate at or before the event ts (co-partition by key +
    merge_asof per partition). The right side is pre-aggregated to one
    row per (user, day), so the as-of pick is tie-free and
    deterministic on both engines."""
    from ray.data.aggregate import Sum

    from ..ops.joins import asof_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "user_id": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    daily = orders.groupby(["user_id", "o_orderdate"]).aggregate(
        Sum("cents", alias_name="day_cents")
    )
    events = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    joined = asof_join(
        events, daily, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderdate", "day_cents"],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["day_cents"]))
        return pa.Table.from_pydict(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "o_orderdate": pc.cast(t["o_orderdate"], pa.timestamp("us")),
                "day_cents": pc.cast(t["day_cents"], pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_ASOF = """
SELECT event_id, events.user_id AS user_id, o_orderdate, day_cents
FROM events ASOF JOIN (
  SELECT o_custkey AS user_id, o_orderdate,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM orders GROUP BY o_custkey, o_orderdate
) daily ON events.user_id = daily.user_id AND daily.o_orderdate <= events.ts
"""

# --- events_order_window (most-specific containing range) ------------------

_PRIORITY_WIDTH_DAYS = {
    "1-URGENT": 7, "2-HIGH": 14, "3-MEDIUM": 21, "4-NOT SPECIFIED": 28, "5-LOW": 35,
}


def q_orders_blame_window(sf_dir: str):
    """Most-specific-range attribution (blame-join shape,
    ``relationship_creator.py:320-378``): each order attaches to the
    NARROWEST same-customer order window [o_orderdate, o_orderdate +
    width) containing its own date — window width varies by order
    priority (urgent orders cast tighter windows), ties broken by
    (start, o_orderkey). Windows overlap/nest arbitrarily, which is
    exactly what ``interval_join`` (innermost, non-overlapping) cannot
    express."""
    import datetime

    from ..ops.joins import most_specific_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def windows(t: pa.Table) -> pa.Table:
        starts = t["o_orderdate"].to_pylist()
        widths = [_PRIORITY_WIDTH_DAYS.get(p, 35) for p in t["o_orderpriority"].to_pylist()]
        ends = [s + datetime.timedelta(days=w) for s, w in zip(starts, widths)]
        return pa.Table.from_pydict(
            {
                "user_id": t["o_custkey"],
                "win_start": pa.array(starts, pa.timestamp("us")),
                "win_end": pa.array(ends, pa.timestamp("us")),
                "o_orderkey": t["o_orderkey"],
                "width_days": pa.array(widths, pa.int64()),
            }
        )

    def points(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": t["o_custkey"],
                "point_key": t["o_orderkey"],
                "pdate": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            }
        )

    intervals = orders.map_batches(windows, batch_format="pyarrow")
    pts = orders.map_batches(points, batch_format="pyarrow")
    joined = most_specific_join(
        pts, intervals, key="user_id", point_col="pdate",
        start_col="win_start", end_col="win_end",
        payload_cols=["o_orderkey", "width_days"], tie_cols=["o_orderkey"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "point_key": pc.cast(t["point_key"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "width_days": pc.cast(t["width_days"], pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_ORDER_WINDOW = """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(CASE o_orderpriority
              WHEN '1-URGENT' THEN 7 WHEN '2-HIGH' THEN 14
              WHEN '3-MEDIUM' THEN 21 WHEN '4-NOT SPECIFIED' THEN 28
              ELSE 35 END AS BIGINT) AS width_days
  FROM orders)
SELECT point_key, user_id, o_orderkey, width_days FROM (
  SELECT p.o_orderkey AS point_key, p.o_custkey AS user_id,
         w.o_orderkey, w.width_days,
         row_number() OVER (PARTITION BY p.o_orderkey
                            ORDER BY w.width_days, w.o_orderdate, w.o_orderkey) AS rn
  FROM orders p JOIN w ON p.o_custkey = w.o_custkey
   AND w.o_orderdate <= p.o_orderdate
   AND p.o_orderdate < w.o_orderdate + w.width_days * INTERVAL 1 DAY
) WHERE rn = 1
"""

# ---------------------------------------------------------------------------

# --- running_revenue_per_user (window function) ----------------------------

def q_running_revenue_per_user(sf_dir: str):
    """Cumulative revenue per user ordered by (ts, event_id) — the
    SUM() OVER (PARTITION BY ... ORDER BY ...) window shape: users are
    hash-routed into partition-level groups, the cumulative sum is one
    vectorized pandas groupby-cumsum per group. Money as integer cents
    (order-independent exact sums)."""
    import pandas as pd  # noqa: F401

    ev = _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def partial(df):
        df = df.copy()
        df["cents"] = _round_half_away(df["value"].to_numpy() * 100).astype("int64")
        return _with_pkey(df[["user_id", "event_id", "ts", "cents"]], "user_id")

    def win(g):
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g["cum_cents"] = g.groupby("user_id", sort=False)["cents"].cumsum()
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(g["user_id"].astype("int64")),
                "event_id": pa.array(g["event_id"].astype("int64")),
                "cum_cents": pa.array(g["cum_cents"].astype("int64")),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("_pkey")
        .map_groups(win, batch_format="pandas")
    )


SQL_RUNNING_REVENUE = """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS cum_cents
FROM events
"""

# --- top_suppliers_by_revenue (broadcast dim join + top-k) ------------------

def q_top_suppliers_by_revenue(sf_dir: str):
    """Revenue per supplier (lineitem ⋈ supplier) → top 10. The supplier
    dim is broadcast as a sorted key array; the fact scan does a
    searchsorted map-side join + per-batch bincount partial."""
    import ray as _ray

    from ..util import get_broadcast

    li = _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    keys = np.asarray(sup["s_suppkey"].to_pylist(), dtype=np.int64)
    names = np.asarray(sup["s_name"].to_pylist(), dtype=object)
    srt = np.argsort(keys, kind="mergesort")
    dim_ref = _ray.put((keys[srt], names[srt]))
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ks, nm = get_broadcast(dim_ref)
        lk = np.asarray(t["l_suppkey"].combine_chunks(), dtype=np.int64)
        pos = np.searchsorted(ks, lk)
        pos_c = np.clip(pos, 0, len(ks) - 1)
        hit = ks[pos_c] == lk  # inner-join semantics
        ext = np.asarray(t["l_extendedprice"].combine_chunks(), dtype=np.float64)[hit]
        disc = np.asarray(t["l_discount"].combine_chunks(), dtype=np.float64)[hit]
        rev = _round_half_away(ext * (1 - disc) * 100)
        code = pos_c[hit]
        cents = np.bincount(code, weights=rev, minlength=len(ks)).astype(np.int64)
        cnt = np.bincount(code, minlength=len(ks))
        nz = cnt > 0  # suppliers untouched by this batch stay out (inner join)
        return pa.Table.from_pydict(
            {
                "s_name": pa.array(list(nm[nz]), pa.string()),
                "revenue_cents": pa.array(cents[nz]),
            }
        )

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("s_name")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .sort(["revenue_cents", "s_name"], descending=[True, False])
        .limit(10)
    )


SQL_TOP_SUPPLIERS = """
SELECT s_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY revenue_cents DESC, s_name
LIMIT 10
"""


QUERIES = {
    "orders_last_event": q_orders_last_event,
    "pricing_summary": q_pricing_summary,
    "top_customer_revenue": q_top_customer_revenue,
    "users_without_purchase": q_users_without_purchase,
    "doc_stats_top10": q_doc_stats_top10,
    "latest_event_per_user": q_latest_event_per_user,
    "events_hourly": q_events_hourly,
    "sessionize_users": q_sessionize_users,
    "exact_dedup_docs": q_exact_dedup_docs,
    "token_counts": q_token_counts,
    "char_class_stats": q_char_class_stats,
    "vector_topk": q_vector_topk,
    "grep_docs": q_grep_docs,
    "order_priority_revenue": q_order_priority_revenue,
    "topk_docs_per_source": q_topk_docs_per_source,
    "distinct_users_per_type": q_distinct_users_per_type,
    "nation_rollup": q_nation_rollup,
    "orders_blame_window": q_orders_blame_window,
    "running_revenue_per_user": q_running_revenue_per_user,
    "top_suppliers_by_revenue": q_top_suppliers_by_revenue,
}

ORACLE_SQL: dict[str, str] = {
    "orders_last_event": SQL_ASOF,
    "pricing_summary": SQL_PRICING,
    "top_customer_revenue": SQL_TOP_CUSTOMER,
    "users_without_purchase": SQL_NO_PURCHASE,
    "doc_stats_top10": SQL_DOC_STATS,
    "latest_event_per_user": SQL_LATEST_EVENT,
    "events_hourly": SQL_EVENTS_HOURLY,
    "sessionize_users": SQL_SESSIONIZE,
    "exact_dedup_docs": SQL_EXACT_DEDUP,
    "token_counts": SQL_TOKEN_COUNTS,
    "char_class_stats": SQL_CHAR_CLASS,
    "vector_topk": SQL_VECTOR_TOPK,
    "grep_docs": SQL_GREP,
    "order_priority_revenue": SQL_ORDER_PRIORITY,
    "topk_docs_per_source": SQL_TOPK_PER_SOURCE,
    "distinct_users_per_type": SQL_DISTINCT_USERS,
    "nation_rollup": SQL_NATION_ROLLUP,
    "orders_blame_window": SQL_ORDER_WINDOW,
    "running_revenue_per_user": SQL_RUNNING_REVENUE,
    "top_suppliers_by_revenue": SQL_TOP_SUPPLIERS,
}

# extended battery (join trees, HAVING filters, funnels, word stats):
# analytics_ext self-registers into QUERIES/ORACLE_SQL at ITS bottom —
# a plain module import here (no attribute access) is safe in both
# import orders despite the mutual dependency.
from . import analytics_ext  # noqa: E402, F401

# window/rank/rollup/quantile/co-occurrence battery — same self-register
# contract as analytics_ext
from . import analytics_win  # noqa: E402, F401

# collocation / duplication-stat / lag-window battery — same contract
from . import analytics_rank  # noqa: E402, F401

# cohort / gaps-and-islands / set-similarity battery — same contract
from . import analytics_cohort  # noqa: E402, F401

# graph-structure / set-op / pivot / vector-radius battery — same contract
from . import analytics_graph  # noqa: E402, F401

# sequence / funnel-lag / statistics / degree-distribution battery — same contract
from . import analytics_seq  # noqa: E402, F401

# quantile / range-window / argmax battery — same contract
from . import analytics_quant  # noqa: E402, F401

# relational-composition / semi-structured battery — same contract
from . import analytics_rel  # noqa: E402, F401

# decision-support composition battery (Q4/Q17/Q22/Q8 shapes) — same contract
from . import analytics_tpch  # noqa: E402, F401

# sequence-packing battery (concat-and-chunk pack plan) — same contract
from . import analytics_pack  # noqa: E402, F401

# training-export battery (shuffle-shard plan, fuzzy decontamination) — same contract
from . import analytics_export  # noqa: E402, F401
