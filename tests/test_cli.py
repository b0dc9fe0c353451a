"""CLI surface: python -m valere_ocr_ray {synth,extract,summary}.

Runs in subprocesses (the CLI owns its own Ray session — kept tiny)."""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "valere_ocr_ray", *args],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        timeout=240,
    )
    return out.stdout


def test_cli_synth_extract_summary(tmp_path):
    d_in, d_out = str(tmp_path / "in"), str(tmp_path / "out")
    s = json.loads(_run("synth", "--out", d_in, "--rows", "60", "--shards", "2"))
    assert s["shards"] == 2

    out = _run("extract", "--input", d_in, "--out", d_out, "--num-cpus", "2")
    summary = json.loads(out)
    assert summary["totals"]["n_in"] == 60
    assert summary["totals"]["n_partitions"] == 2

    # resumable: second run does nothing
    out2 = json.loads(_run("extract", "--input", d_in, "--out", d_out, "--num-cpus", "2"))
    assert out2["groups"] == []
    assert out2["n_skipped_complete"] == 2

    printed = json.loads(_run("summary", "--out", d_out))
    assert printed["n_in"] == 60


def test_cli_curate(tmp_path):
    d_in, d_out = str(tmp_path / "in"), str(tmp_path / "shards")
    json.loads(_run("synth", "--out", d_in, "--rows", "120", "--shards", "2"))
    s = json.loads(
        _run(
            "curate", "--input", d_in, "--out", d_out,
            "--num-cpus", "2", "--budget", "128", "--shards", "2",
        )
    )
    assert s["n_docs_out"] > 0 and s["n_sequences"] > 0
    assert os.path.isdir(d_out)
