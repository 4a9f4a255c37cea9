"""End-to-end test of the `python -m pyschema_ray.run` job driver
(the `ray job submit` entry point): fresh subprocess, JSON config,
resume on re-submission."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMA_MODULE = '''
from pyschema_ray import Record, Text, Integer, List

class JobSequences(Record):
    doc_id = Text(nullable=False, regex=r"^doc-\\d{12}$", unique=True)
    tokens = List(Integer(size=4), nullable=False,
                  element_min=0, element_max=50_000)
    n_tok = Integer(size=4, min=1, max=4096, equals_length_of="tokens")
    source = Text(nullable=False)
    _key_field = "doc_id"
'''


@pytest.fixture(scope="module")
def job_dir(tmp_path_factory, synth_corpus):
    d = tmp_path_factory.mktemp("job")
    (d / "job_schemas.py").write_text(SCHEMA_MODULE)
    cfg = {
        "schema": "JobSequences",
        "schema_module": "job_schemas",
        "input": synth_corpus["dir"],
        "out_dir": str(d / "out"),
        "files_per_shard": 4,
        "stats": {"quantile_column": "n_tok",
                  "cardinality_column": "doc_id"},
        "ref_sets": {"source": ["sources_dim", "source",
                                ["web", "books", "code", "wiki",
                                 "forums"]]},
    }
    (d / "job.json").write_text(json.dumps(cfg))
    return d


def _submit(job_dir):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{job_dir}"
    env.pop("RAY_ADDRESS", None)  # fresh local session inside the driver
    return subprocess.run(
        [sys.executable, "-m", "pyschema_ray.run",
         "--config", str(job_dir / "job.json"), "--num-cpus", "2"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)


def test_submit_and_resume(job_dir):
    p1 = _submit(job_dir)
    assert p1.returncode == 1, p1.stderr[-1500:]  # completed, FAILED validation
    rep1 = json.loads(p1.stdout.strip().splitlines()[-1])
    assert rep1["rows"] == 10_000
    assert rep1["violation_counts"]["regex(doc_id)"] == 20
    assert rep1["shards_skipped_by_resume"] == 0

    # re-submission: everything resumes from the manifest
    p2 = _submit(job_dir)
    assert p2.returncode == 1, p2.stderr[-1500:]
    rep2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert rep2["shards_skipped_by_resume"] == rep2["shards"]
    assert rep2["violation_counts"] == rep1["violation_counts"]
    assert rep2["wall_time_s"] < rep1["wall_time_s"]


def test_submit_bad_config(job_dir, tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"schema": "NoSuch", "input": "/nope",
                               "out_dir": str(tmp_path / "o")}))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("RAY_ADDRESS", None)
    p = subprocess.run(
        [sys.executable, "-m", "pyschema_ray.run", "--config", str(bad),
         "--num-cpus", "2"],
        capture_output=True, text=True, timeout=180, env=env, cwd=REPO)
    assert p.returncode == 2
    assert "error" in p.stderr
