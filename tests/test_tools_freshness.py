"""tools/check_freshness.py — the two-round freshness invariant, and the
ADVICE-r7 escalation: a query that stays NEW-UNCHECKED across two DIFFERENT
rounds (the required window slot never materialized) must turn the exit
code red instead of staying a polite note forever. Pure-subprocess tests
against a synthetic entry module — no Spark session."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ENTRY = """
def queries():
    qs = {f"q{i:02d}": None for i in range(60)}
    %s
    return qs

def oracle_sql():
    return {k: "SELECT 1" for k in queries()}
"""


def _setup(tmp_path, extra=""):
    shutil.copy(
        os.path.join(REPO, "tools", "check_freshness.py"),
        tmp_path / "check_freshness.py",
    )
    (tmp_path / "__spark_entry__.py").write_text(_ENTRY % extra)
    # prev record covers the 10 registered queries outside the 50-window
    rec = {f"q{i:02d}": {"hash_match": True} for i in range(50, 60)}
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(rec))
    return rec


def _run(tmp_path, record):
    return subprocess.run(
        [sys.executable, "check_freshness.py", record],
        cwd=tmp_path, capture_output=True, text=True,
    )


def test_covered_rotation_is_green(tmp_path):
    _setup(tmp_path)
    r = _run(tmp_path, "CORRECTNESS_r07.json")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "freshness invariant OK" in r.stdout
    assert "NEW-UNCHECKED" not in r.stdout


def test_stale_query_exits_one(tmp_path):
    # q55 was checked once long ago but is in neither prev nor window
    rec = _setup(tmp_path)
    old = dict(rec)
    old["q55"] = {"hash_match": True}
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(old))
    del rec["q55"]
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(rec))
    r = _run(tmp_path, "CORRECTNESS_r07.json")
    assert r.returncode == 1
    assert "STALE" in r.stdout and "q55" in r.stdout


def test_new_unchecked_escalates_on_second_round(tmp_path):
    _setup(tmp_path, extra='qs["ghost"] = None')
    r1 = _run(tmp_path, "CORRECTNESS_r07.json")
    assert r1.returncode == 0
    assert "NEW-UNCHECKED" in r1.stdout and "ghost" in r1.stdout
    state = json.loads((tmp_path / "new_unchecked_state.json").read_text())
    assert state == {"ghost": 8}
    # same round re-run: idempotent, still exit 0
    r2 = _run(tmp_path, "CORRECTNESS_r07.json")
    assert r2.returncode == 0
    # the next round's record lands and ghost STILL has no row and no
    # window slot -> the promise was broken -> exit 1
    shutil.copy(tmp_path / "CORRECTNESS_r07.json",
                tmp_path / "CORRECTNESS_r08.json")
    r3 = _run(tmp_path, "CORRECTNESS_r08.json")
    assert r3.returncode == 1
    assert "SECOND ROUND" in r3.stdout and "ghost" in r3.stdout


def test_state_clears_when_query_takes_a_slot(tmp_path):
    # ghost was flagged for round 8, but the rotation DID pick it up
    # (simulated: it finally has a prev-record row) -> state empties, green
    _setup(tmp_path, extra='qs["ghost"] = None')
    (tmp_path / "new_unchecked_state.json").write_text(json.dumps({"ghost": 8}))
    rec = {f"q{i:02d}": {"hash_match": True} for i in range(50, 60)}
    rec["ghost"] = {"hash_match": True}
    (tmp_path / "CORRECTNESS_r08.json").write_text(json.dumps(rec))
    r = _run(tmp_path, "CORRECTNESS_r08.json")
    assert r.returncode == 0, r.stdout + r.stderr
    assert json.loads((tmp_path / "new_unchecked_state.json").read_text()) == {}
