"""Pipeline-runner resume semantics: with --resume, a stage whose completion
marker exists is skipped and recorded as resumed; without the marker (or
without --resume) the stage runs. Guards the post-interruption pickup path
that saved the round-5 ConvNeXt pipeline from repaying its ~2400 s whitebox
stage (tools/run_robustness.py run_stage).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools import run_robustness  # noqa: E402


def _stub_subprocess(monkeypatch, calls):
    class _Proc:
        returncode = 0
        stdout = "ran\n"
        stderr = ""

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _Proc()

    monkeypatch.setattr(run_robustness.subprocess, "run", fake_run)


def test_marker_skips_stage_under_resume(monkeypatch, tmp_path):
    calls: list = []
    _stub_subprocess(monkeypatch, calls)
    monkeypatch.setattr(run_robustness, "RESUME", True)
    marker = tmp_path / "test" / "pgd" / "metadata.csv"
    marker.parent.mkdir(parents=True)
    marker.write_text("path,label\n")

    stages: list = []
    run_robustness.run_stage("attack-whitebox", ["attack"], stages,
                             done_marker=str(marker))
    assert calls == []  # no subprocess launched
    assert stages == [{"stage": "attack-whitebox", "seconds": None,
                       "rc": 0, "resumed": True}]


def test_missing_marker_runs_stage_under_resume(monkeypatch, tmp_path):
    calls: list = []
    _stub_subprocess(monkeypatch, calls)
    monkeypatch.setattr(run_robustness, "RESUME", True)

    stages: list = []
    run_robustness.run_stage("attack-autoattack", ["autoattack"], stages,
                             done_marker=str(tmp_path / "absent.csv"))
    assert len(calls) == 1
    assert stages[0]["rc"] == 0 and "resumed" not in stages[0]


def test_marker_ignored_without_resume(monkeypatch, tmp_path):
    calls: list = []
    _stub_subprocess(monkeypatch, calls)
    monkeypatch.setattr(run_robustness, "RESUME", False)
    marker = tmp_path / "metadata.csv"
    marker.write_text("x\n")

    stages: list = []
    run_robustness.run_stage("attack-rp2", ["rp2-attack"], stages,
                             done_marker=str(marker))
    assert len(calls) == 1  # marker only honored when --resume was given


def test_stage_without_marker_always_runs(monkeypatch):
    calls: list = []
    _stub_subprocess(monkeypatch, calls)
    monkeypatch.setattr(run_robustness, "RESUME", True)

    stages: list = []
    run_robustness.run_stage("eval-compose", ["eval-compose"], stages)
    assert len(calls) == 1  # eval-compose always reruns (no marker wired)
