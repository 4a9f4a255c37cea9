"""Text-lines corpus source/sink: one document per line, the
plainest LLM-corpus wire format (and the one shell tools speak).

Each line is ``<key>\\t<escaped text>``.  Escaping is single-pass-safe
percent style — ``%`` -> ``%25`` first, then TAB/LF/CR -> ``%09`` /
``%0A`` / ``%0D`` — so any unicode text round-trips byte-exactly and
the inverse (codes first, ``%25`` last) can be applied as chained
vectorized ``replace_substring`` calls with no ambiguity: after
escaping, every ``%`` in the stream starts exactly one code.

Sink layout is the repo's resumable convention: one file per block,
named ``<min key>-<max key>-<content sha1[:12]>.txt`` (atomic
tmp+rename, skipped when already present), so a restarted writer
re-emits identical bytes to identical names instead of duplicating.
The reader is ``ray.data.read_text`` + one vectorized parse pass.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc


def _escape(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    s = pc.replace_substring(col, pattern="%", replacement="%25")
    s = pc.replace_substring(s, pattern="\t", replacement="%09")
    s = pc.replace_substring(s, pattern="\n", replacement="%0A")
    s = pc.replace_substring(s, pattern="\r", replacement="%0D")
    return s


def _unescape(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    s = pc.replace_substring(col, pattern="%09", replacement="\t")
    s = pc.replace_substring(s, pattern="%0A", replacement="\n")
    s = pc.replace_substring(s, pattern="%0D", replacement="\r")
    s = pc.replace_substring(s, pattern="%25", replacement="%")
    return s


def write_text_lines(ds, out_dir: str, key_col: str = "doc_id",
                     text_col: str = "text"):
    """Write ``ds`` as tab-separated escaped text lines, one file per
    block.  Null keys are dropped; null text writes as the empty
    string (documented lossy-on-null — the format has no NULL).
    Returns the per-file manifest as a pa.Table(path, n_rows)."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        empty = pa.table({"path": pa.array([], pa.string()),
                          "n_rows": pa.array([], pa.int64())})
        t = t.filter(pc.is_valid(t[key_col]))
        if t.num_rows == 0:
            return empty
        keys = pc.cast(t[key_col], pa.string())
        body = _escape(pc.fill_null(pc.cast(t[text_col], pa.string()),
                                    ""))
        lines = pc.binary_join_element_wise(keys, body, "\t")
        blob = ("\n".join(lines.to_pylist()) + "\n").encode("utf-8")
        kmin = pc.min(t[key_col]).as_py()
        kmax = pc.max(t[key_col]).as_py()
        name = (f"{kmin}-{kmax}-"
                f"{hashlib.sha1(blob).hexdigest()[:12]}.txt")
        path = os.path.join(out_dir, name)
        if not os.path.exists(path):           # resumable skip
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_rows": pa.array([t.num_rows], pa.int64())})

    parts = [b for b in ds.map_batches(dump, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
    if not parts:
        return pa.table({"path": pa.array([], pa.string()),
                         "n_rows": pa.array([], pa.int64())})
    return pa.concat_tables(parts)


def read_text_lines(path: str, key_col: str = "doc_id",
                    text_col: str = "text",
                    key_type: pa.DataType = pa.int64()):
    """Read a text-lines corpus back into Dataset(key_col, text_col).
    One ``read_text`` scan plus a vectorized split/unescape pass."""
    import ray.data

    def parse(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], pattern="\t",
                                 max_splits=1)
        # the writer always emits exactly one tab per line
        keys = pc.list_element(parts, 0)
        body = pc.list_element(parts, 1)
        return pa.table({key_col: pc.cast(keys, key_type),
                         text_col: _unescape(body)})

    return ray.data.read_text(path).map_batches(
        parse, batch_format="pyarrow")
