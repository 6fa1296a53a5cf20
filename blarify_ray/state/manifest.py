"""Checkpoint manifests — resumable stage outputs with lineage.

Analog of the reference's DB-side work-queue state machine
(``processing_status`` / ``processing_run_id`` claim-then-complete
protocol, ``blarify/documentation/queries/batch_processing_queries.py:18-48,
114-126,350-402``), re-expressed for a batch Parquet pipeline: every
stage writes to a temp dir, atomically renames into place, and records a
manifest ``{stage, lineage, rows, wall_s}``. A re-run recomputes a stage
only when its lineage hash (code version + config + upstream lineages)
changed — the run_id-mismatch invalidation rule
(``batch_processing_queries.py:20``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

import pyarrow.dataset as pads
import ray.data

from .. import __version__


_CODE_DIGEST: str | None = None


def _code_digest() -> str:
    """md5 over the package's .py sources — lineage becomes code-change
    sensitive, so a checkpoint produced by older code never survives a
    deploy (the run_id-mismatch invalidation, made automatic)."""
    global _CODE_DIGEST
    if _CODE_DIGEST is None:
        import blarify_ray

        root = os.path.dirname(blarify_ray.__file__)
        h = hashlib.md5()
        for dp, _dns, fns in sorted(os.walk(root)):
            for fn in sorted(fns):
                if fn.endswith(".py"):
                    with open(os.path.join(dp, fn), "rb") as f:
                        h.update(f.read())
        _CODE_DIGEST = h.hexdigest()
    return _CODE_DIGEST


def lineage_hash(*parts: object) -> str:
    blob = json.dumps([__version__, _code_digest(), *[str(p) for p in parts]], sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()


def _stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(_stage_dir(out_dir, stage), "_MANIFEST.json")


def read_manifest(out_dir: str, stage: str) -> dict | None:
    p = _manifest_path(out_dir, stage)
    if os.path.exists(p):
        with open(p) as f:
            try:
                return json.load(f)
            except json.JSONDecodeError:
                return None  # torn pre-atomic-write manifest → stage is stale
    return None


def run_stage(
    out_dir: str,
    stage: str,
    lineage: str,
    producer: Callable[[str], None],
    metrics: dict | None = None,
) -> tuple[str, bool]:
    """Run ``producer(tmp_path)`` (which must write parquet files into the
    path) unless a manifest with matching lineage already exists.
    Returns (stage_path, skipped)."""
    path = _stage_dir(out_dir, stage)
    man = read_manifest(out_dir, stage)
    if man is not None and man.get("lineage") == lineage:
        return path, True

    tmp = os.path.join(out_dir, f".tmp-{stage}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    producer(tmp)
    wall = time.monotonic() - t0
    rows = sum(f.count_rows() for f in pads.dataset(tmp, format="parquet").get_fragments())
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    man = {
        "stage": stage,
        "lineage": lineage,
        "rows": int(rows),
        "wall_s": round(wall, 3),
        **(metrics or {}),
    }
    _write_manifest_atomic(_manifest_path(out_dir, stage), man)
    _append_metrics(out_dir, man)
    return path, False


def _write_manifest_atomic(path: str, man: dict) -> None:
    """tmp + os.replace: a crash mid-write must never leave a TORN
    manifest — a truncated _MANIFEST.json looks 'present' to existence
    checks while failing to parse, the worst of both worlds (the data
    dir rename is already atomic; the commit record must be too)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, path)


def run_fused_stages(
    out_dir: str,
    first: tuple[str, str],
    second: tuple[str, str],
    producer: Callable[[str, str], None],
) -> tuple[str, str]:
    """Run ONE producer that writes two stages' outputs (e.g. a tee'd
    checkpoint mid-pipeline) in a single execution. Both stages commit
    atomically together: tmp dirs are renamed and manifests written only
    after the producer finishes, so a mid-run failure leaves neither
    stage half-committed."""
    names = (first[0], second[0])
    tmps = [os.path.join(out_dir, f".tmp-{s}") for s in names]
    for tmp in tmps:
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    producer(*tmps)
    wall = time.monotonic() - t0
    out_paths = []
    for (stage, lineage), tmp in zip((first, second), tmps):
        rows = sum(
            f.count_rows() for f in pads.dataset(tmp, format="parquet").get_fragments()
        )
        path = _stage_dir(out_dir, stage)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        man = {
            "stage": stage,
            "lineage": lineage,
            "rows": int(rows),
            "wall_s": round(wall, 3),
            "fused_with": names[0] if stage == names[1] else names[1],
        }
        _write_manifest_atomic(_manifest_path(out_dir, stage), man)
        _append_metrics(out_dir, man)
        out_paths.append(path)
    return out_paths[0], out_paths[1]


def _append_metrics(out_dir: str, row: dict) -> None:
    with open(os.path.join(out_dir, "_metrics.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def read_stage(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    paths = [
        os.path.join(dp, fn)
        for dp, _dns, fns in os.walk(path)
        for fn in fns
        if fn.endswith(".parquet")
    ]
    ds = ray.data.read_parquet(paths, columns=columns)
    # hive partition values come back as strings; restore the typed bucket
    schema = ds.schema()
    if "bucket" in schema.names and (columns is None or "bucket" in columns):
        import pyarrow as pa
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("bucket"), "bucket", pc.cast(t["bucket"], pa.int32())
            ),
            batch_format="pyarrow",
        )
    return ds
