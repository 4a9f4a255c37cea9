"""Text-lines source/sink: byte-exact roundtrip incl. tabs, newlines,
percent signs and unicode; resumable shard naming; empty input."""

import os
import tempfile

import numpy as np
import pyarrow as pa

from pyschema_ray.sources.textlines import (read_text_lines,
                                            write_text_lines)


def _ds(tbl, blocks=3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _tab(ds):
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


TEXTS = ["plain words", "tab\there", "new\nline", "cr\rhere",
         "percent 100% and %09 literal", "unicode é中文",
         "", "%25%0A mixed \t\n\r%", None]


def test_textlines_roundtrip_exact(ray_session):
    t = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        manifest = write_text_lines(_ds(t, 3), d)
        assert sum(manifest["n_rows"].to_pylist()) == len(TEXTS)
        back = _tab(read_text_lines(d)).sort_by("doc_id")
        assert back["doc_id"].to_pylist() == list(range(len(TEXTS)))
        want = [x if x is not None else "" for x in TEXTS]
        assert back["text"].to_pylist() == want


def test_textlines_write_is_resumable(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a", "b"], pa.string())})
    with tempfile.TemporaryDirectory() as d:
        m1 = write_text_lines(_ds(t, 1), d)
        files1 = sorted(os.listdir(d))
        m2 = write_text_lines(_ds(t, 1), d)     # identical rerun
        assert sorted(os.listdir(d)) == files1   # no duplicates
        assert sorted(m1["path"].to_pylist()) == \
            sorted(m2["path"].to_pylist())


def test_textlines_empty(ray_session):
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    with tempfile.TemporaryDirectory() as d:
        m = write_text_lines(_ds(t, 1), d)
        assert m.num_rows == 0
