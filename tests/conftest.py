"""Session-scoped Ray fixture — Ray is initialized ONCE per pytest
session (never per test/module) and shut down at teardown."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_corpus(tmp_path_factory):
    """N=10_000 seeded corpus with injected violations, written as 8
    parquet files; shared by the parity / pipeline / resume tests."""
    from pyschema_ray.sources.synth import generate_sequences

    d = tmp_path_factory.mktemp("corpus")
    paths, expected = generate_sequences(10_000, out_dir=str(d), n_files=8)
    return {"dir": str(d), "paths": paths, "expected": expected}


@pytest.fixture(scope="session")
def sequences_schema():
    from pyschema_ray import Integer, List, Record, Text
    from pyschema_ray.sources.synth import VOCAB

    class Sequences(Record):
        doc_id = Text(nullable=False, regex=r"^doc-\d{12}$", unique=True)
        tokens = List(Integer(size=4), nullable=False,
                      element_min=0, element_max=VOCAB)
        n_tok = Integer(size=4, min=1, max=4096, equals_length_of="tokens")
        source = Text(nullable=False)
        _key_field = "doc_id"

    return Sequences
