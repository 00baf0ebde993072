"""The bench-doc drift gate actually gates (VERDICT r4 weak 1): the
benchmark matrix in README.md / BENCHMARKS.md must be generated from the
latest driver BENCH_r*.json — tools/gen_bench_docs.py --check runs IN the
suite so a stale table fails CI, not just a forgotten manual check."""

import subprocess
import sys


def test_bench_docs_match_latest_json():
    root = __file__.rsplit("/", 2)[0]
    r = subprocess.run(
        [sys.executable, f"{root}/tools/gen_bench_docs.py", "--check"],
        capture_output=True, text=True)
    assert r.returncode == 0, (
        "bench tables drifted from the driver JSON — run "
        f"tools/gen_bench_docs.py\n{r.stdout}{r.stderr}")
