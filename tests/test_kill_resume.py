"""Kill-mid-run → resume produces byte-identical output (FIXTURES.md §4:
rerun-after-kill invariant). Runs the CLI build in a subprocess, SIGKILLs
it mid-pipeline, resumes, and compares against an uninterrupted build."""

import os
import shutil
import signal
import subprocess
import sys
import time

import pyarrow.dataset as pads

N = 2000
OUT_KILLED = "/tmp/blarify_ray_kill"
OUT_CLEAN = "/tmp/blarify_ray_kill_ref"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build(out: str, timeout: int | None = None, kill_after: float | None = None) -> int:
    proc = subprocess.Popen(
        [sys.executable, "-m", "blarify_ray", "build", "--out", out, "--pages", str(N), "--num-cpus", "4"],
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # isolate from the test session's Ray
    )
    if kill_after is not None:
        time.sleep(kill_after)
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        return -9
    return proc.wait(timeout=timeout)


def _table(out: str, stage: str):
    return (
        pads.dataset(
            [
                os.path.join(dp, f)
                for dp, _, fs in os.walk(os.path.join(out, stage))
                for f in fs
                if f.endswith(".parquet")
            ],
            format="parquet",
        )
        .to_table()
        .sort_by([(c, "ascending") for c in ("entity_id",) if stage == "entities"] or [("src_id", "ascending"), ("pred", "ascending"), ("dst_id", "ascending")])
    )


def test_kill_mid_run_then_resume_identical():
    shutil.rmtree(OUT_KILLED, ignore_errors=True)
    shutil.rmtree(OUT_CLEAN, ignore_errors=True)

    # uninterrupted reference build
    assert _build(OUT_CLEAN, timeout=300) == 0

    # killed build: SIGKILL while the pipeline is mid-flight; retry with
    # earlier kills if the machine finished before the signal landed
    finished: set[str] = set()
    for kill_after in (15.0, 9.0, 5.0):
        shutil.rmtree(OUT_KILLED, ignore_errors=True)
        _build(OUT_KILLED, kill_after=kill_after)
        finished = {
            s
            for s in ("docs", "mentions", "canonical", "entities", "edges")
            if os.path.exists(os.path.join(OUT_KILLED, s, "_MANIFEST.json"))
        }
        if len(finished) < 5:
            break
    assert len(finished) < 5, "build finished before every kill attempt"

    # resume: completed stages must be skipped (mtime unchanged), output
    # must equal the uninterrupted build
    mtimes = {
        s: os.path.getmtime(os.path.join(OUT_KILLED, s, "_MANIFEST.json")) for s in finished
    }
    assert _build(OUT_KILLED, timeout=300) == 0
    for s in finished:
        assert os.path.getmtime(os.path.join(OUT_KILLED, s, "_MANIFEST.json")) == mtimes[s]

    for stage in ("entities", "edges"):
        a, b = _table(OUT_KILLED, stage), _table(OUT_CLEAN, stage)
        assert a.num_rows == b.num_rows
        assert a.equals(b), f"{stage} differs after kill+resume"
