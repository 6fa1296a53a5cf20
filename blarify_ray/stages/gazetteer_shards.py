"""Domain-sharded gazetteer — the entity dictionary BEYOND broadcast
scale (SURVEY §2.9 / VERDICT r4 Missing #3).

Reference analog: the reference keys multiple SCIP indexes by package
root and a file consults only its own package's index
(``blarify/code_references/scip_helper.py:330-465``). The web-KG analog
shards the ALIAS TABLE by the hash of each alias's FIRST normalized
token — exactly the key the leftmost-longest matcher probes with — as a
hive parquet layout (the ``edges_by_dst`` zero-shuffle pattern). A
worker then holds only the shards its pages' vocabulary touches (LRU of
per-shard index structures), never the whole dictionary: per-worker
dictionary memory becomes O(touched vocabulary / n_shards · cache), and
a bigger entity universe costs disk, not broadcast RAM.

Parity contract: ``ShardedGazetteer`` inherits the UNMODIFIED
``Gazetteer.find_mentions`` algorithm and swaps the three probe
structures (``_by_pair``, ``_singles``, ``alias_map``) plus the entity
metadata lookup for shard-aware views, so matching is equal by
construction — the forced-shard e2e test pins kg_entities/kg_edges
byte-equality against the broadcast tier.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import pyarrow as pa
import ray.data

from ..corpus import Entity
from ..ids import stable_u64
from ..rules import Gazetteer
from ..text import normalize_surface

_META = "_meta.json"


def shard_of(token: str, n_shards: int) -> int:
    """Shard of the alias/probe FIRST token (stable across runs)."""
    return stable_u64(token) % n_shards


def build_gazetteer_shards(
    entities, out_dir: str, n_shards: int = 16
) -> str:
    """Write the alias dictionary hive-partitioned by first-token shard:
    one streaming pass, ``write_parquet(partition_cols=["shard"])``
    splits each batch across its shard dirs — zero shuffle. Row =
    (idx, name, etype, alias_norm); an entity appears in every shard one
    of its aliases hashes to (duplication by alias, the price of
    probe-locality). The in-memory entity tuple here is the test-scale
    convenience input — at dictionary scale the same two-step
    (append shard column → hive write) runs over the entity TABLE."""
    rows: dict[str, list] = {"idx": [], "name": [], "etype": [], "alias_norm": []}
    for e in entities:
        for a in e.aliases:
            norm = normalize_surface(a)
            if not norm:
                continue
            rows["idx"].append(e.idx)
            rows["name"].append(e.name)
            rows["etype"].append(e.etype)
            rows["alias_norm"].append(norm)
    tbl = pa.table(
        {
            "idx": pa.array(rows["idx"], pa.int64()),
            "name": pa.array(rows["name"], pa.string()),
            "etype": pa.array(rows["etype"], pa.string()),
            "alias_norm": pa.array(rows["alias_norm"], pa.string()),
        }
    )

    def add_shard(t: pa.Table) -> pa.Table:
        sh = [
            shard_of(n.split()[0], n_shards) for n in t["alias_norm"].to_pylist()
        ]
        return t.append_column("shard", pa.array(sh, pa.int32()))

    os.makedirs(out_dir, exist_ok=True)
    ray.data.from_arrow(tbl).map_batches(
        add_shard, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["shard"])
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"n_shards": n_shards}, f)
    return out_dir


class _ShardStruct:
    """One shard's probe structures — the same construction as
    ``Gazetteer.__init__`` restricted to the shard's alias rows."""

    __slots__ = ("alias_map", "singles", "by_pair", "ents")

    def __init__(self, rows: pa.Table):
        alias_map: dict[str, list[int]] = {}
        ents: dict[int, Entity] = {}
        token_seqs: set[tuple[str, ...]] = set()
        for idx, name, etype, norm in zip(
            rows["idx"].to_pylist(), rows["name"].to_pylist(),
            rows["etype"].to_pylist(), rows["alias_norm"].to_pylist(),
        ):
            alias_map.setdefault(norm, []).append(idx)
            ents.setdefault(idx, Entity(idx=idx, etype=etype, name=name, aliases=()))
            toks = tuple(norm.split())
            if toks:
                token_seqs.add(toks)
        self.alias_map: dict[str, tuple[int, ...]] = {
            k: tuple(sorted(set(v))) for k, v in alias_map.items()
        }
        self.ents = ents
        self.singles: set[str] = {s[0] for s in token_seqs if len(s) == 1}
        tmp: dict[tuple[str, str], list[tuple[str, ...]]] = {}
        for seq in token_seqs:
            if len(seq) >= 2:
                tmp.setdefault((seq[0], seq[1]), []).append(seq)
        self.by_pair: dict[tuple[str, str], tuple[tuple[str, ...], ...]] = {
            k: tuple(sorted(seqs, key=lambda s: (-len(s), s)))
            for k, seqs in tmp.items()
        }


class _PairView:
    __slots__ = ("g",)

    def __init__(self, g: "ShardedGazetteer"):
        self.g = g

    def get(self, key, default=None):
        return self.g._struct_for(key[0]).by_pair.get(key, default)


class _SinglesView:
    __slots__ = ("g",)

    def __init__(self, g: "ShardedGazetteer"):
        self.g = g

    def __contains__(self, tok: str) -> bool:
        return tok in self.g._struct_for(tok).singles


class _AliasView:
    __slots__ = ("g",)

    def __init__(self, g: "ShardedGazetteer"):
        self.g = g

    def get(self, norm: str, default=()):
        if not norm:
            return default
        return self.g._struct_for(norm.split()[0]).alias_map.get(norm, default)


class _EntsView:
    __slots__ = ("g",)

    def __init__(self, g: "ShardedGazetteer"):
        self.g = g

    def __getitem__(self, idx: int) -> Entity:
        return self.g._ents[idx]


class ShardedGazetteer(Gazetteer):
    """Gazetteer over a ``build_gazetteer_shards`` layout: identical
    matching/linking surface, shard-at-a-time residency.

    ``max_cached`` bounds per-worker shard residency (LRU). Entity
    metadata is refcounted per loaded shard, so eviction frees it too.
    Invariant: ``max_cached`` must cover the distinct first-token shards
    of one page (a page's vocabulary, ÷ n_shards) — locally the default
    covers ALL shards, at scale size it like any working-set cache."""

    def __init__(self, shards_dir: str, max_cached: int = 64):
        # deliberately NOT calling super().__init__ — probe structures
        # are shard-aware views over the on-disk layout
        with open(os.path.join(shards_dir, _META)) as f:
            self.n_shards = int(json.load(f)["n_shards"])
        self.dir = shards_dir
        self.max_cached = max_cached
        self._cache: OrderedDict[int, _ShardStruct] = OrderedDict()
        self._ents: dict[int, Entity] = {}
        self._entref: dict[int, int] = {}
        self.alias_map = _AliasView(self)  # type: ignore[assignment]
        self._singles = _SinglesView(self)  # type: ignore[assignment]
        self._by_pair = _PairView(self)  # type: ignore[assignment]
        self.entities = _EntsView(self)  # type: ignore[assignment]

    # -- shard residency -----------------------------------------------
    def _load(self, sid: int) -> _ShardStruct:
        import pyarrow.parquet as pq

        d = os.path.join(self.dir, f"shard={sid}")
        if os.path.isdir(d):
            rows = pq.read_table(d, columns=["idx", "name", "etype", "alias_norm"])
        else:  # a shard no alias hashed to
            rows = pa.table(
                {"idx": pa.array([], pa.int64()), "name": pa.array([], pa.string()),
                 "etype": pa.array([], pa.string()),
                 "alias_norm": pa.array([], pa.string())}
            )
        return _ShardStruct(rows)

    def _struct_for(self, token: str) -> _ShardStruct:
        sid = shard_of(token, self.n_shards)
        s = self._cache.get(sid)
        if s is not None:
            self._cache.move_to_end(sid)
            return s
        s = self._load(sid)
        self._cache[sid] = s
        for idx, e in s.ents.items():
            self._ents[idx] = e
            self._entref[idx] = self._entref.get(idx, 0) + 1
        while len(self._cache) > self.max_cached:
            _sid, old = self._cache.popitem(last=False)
            for idx in old.ents:
                r = self._entref[idx] - 1
                if r:
                    self._entref[idx] = r
                else:
                    del self._entref[idx]
                    del self._ents[idx]
        return s

    def candidates(self, surface: str) -> tuple[int, ...]:
        return self.alias_map.get(normalize_surface(surface), ())
