"""Doc headline numbers must match the committed bench artifacts
(VERDICT r3 #5: one number of record, drift fails loudly)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_numbers_match_bench_matrix():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_doc_numbers.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_bench_writes_scratch_unless_flagged(tmp_path, monkeypatch):
    """bench.py must not rewrite the matrix of record (which the doc
    bindings above are pinned to) unless SELFREC_TPU_UPDATE_MATRIX=1 —
    ad-hoc/driver runs land in scratch BENCH_LAST.json instead, so
    run-to-run variance can't drift the committed headline numbers."""
    import json

    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)

    def fake_workload():
        return {"metric": "fake", "value": 1.0, "unit": "s"}

    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr(bench, "WORKLOADS", {"fake": fake_workload})
    monkeypatch.setattr(bench, "ref_baselines", lambda: {})
    monkeypatch.setattr(sys, "argv", ["bench.py", "fake"])
    # the orchestrator normally subprocesses each workload (tunnel-memory
    # isolation); the monkeypatched fake workload only exists in THIS
    # process, so force the in-process path
    monkeypatch.setenv("SELFREC_TPU_BENCH_INPROC", "1")

    monkeypatch.delenv("SELFREC_TPU_UPDATE_MATRIX", raising=False)
    # stale scratch from an earlier run/code state must NOT leak into this
    # run's file (ADVICE r4: un-flagged runs start from a clean scratch)
    (tmp_path / "BENCH_LAST.json").write_text(
        json.dumps({"stale": {"metric": "old", "value": 9, "unit": "s"}}))
    bench.main()
    assert (tmp_path / "BENCH_LAST.json").exists()
    assert not (tmp_path / "BENCH_MATRIX.json").exists()
    scratch = json.loads((tmp_path / "BENCH_LAST.json").read_text())
    assert scratch["fake"]["metric"] == "fake"
    assert "stale" not in scratch

    monkeypatch.setenv("SELFREC_TPU_UPDATE_MATRIX", "1")
    bench.main()
    assert (tmp_path / "BENCH_MATRIX.json").exists()


def test_matrix_of_record_covers_every_workload():
    """Driver contract invariants: the SimGCL headline runs FIRST (it must
    print even if a budget-constrained driver run covers nothing else),
    and every registered workload has an entry in the committed matrix of
    record (a silently-dropped workload would read as coverage that isn't
    there — 'no silent caps')."""
    import json

    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)

    names = list(bench.WORKLOADS)
    assert names[0] == "simgcl"
    matrix = json.loads(
        open(os.path.join(REPO, "BENCH_MATRIX.json")).read())
    missing = [n for n in names if n not in matrix]
    assert not missing, f"workloads with no matrix-of-record entry: {missing}"
    stale = [n for n in matrix if n not in names]
    assert not stale, f"matrix entries with no workload: {stale}"
