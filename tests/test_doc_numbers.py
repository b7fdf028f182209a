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
