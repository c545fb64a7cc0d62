"""driver.py CLI end-to-end: run, resume, output/metrics layout."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "driver.py"), *args],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_driver_run_and_resume(tmp_path):
    from wikisource_latin_text_cleaner_spark.sources import synth

    inp = str(tmp_path / "pages.parquet")
    synth.write_pages_parquet(inp, 300, seed=21)
    outd = str(tmp_path / "out")
    common = ["--input", inp, "--output", outd, "--mode", "web",
              "--buckets", "4", "--resume", "--master", "local[4]",
              "--no-classify"]

    r1 = _run(common)
    assert r1["docs_in"] == 300
    assert r1["buckets_run"] == 4
    assert r1["docs_kept"] + r1["docs_quarantined"] == 300
    assert os.path.isdir(os.path.join(outd, "data"))
    assert os.path.isdir(os.path.join(outd, "metrics"))

    r2 = _run(common)
    assert r2["buckets_run"] == 0
    assert (r2["docs_kept"], r2["docs_quarantined"]) == (
        r1["docs_kept"], r1["docs_quarantined"])
