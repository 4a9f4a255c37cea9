"""Local mirror of the driver's correctness gate: run every
``queries()`` entry at sf0.001 and compare row count + column names +
order-insensitive values against ``oracle_sql()`` via DuckDB.  Also
smoke-checks ``entry()``."""

import math
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(round(v, 9))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(map(repr, rows))


def test_entry_smoke():
    t = entrymod.entry()
    assert isinstance(t, pa.Table)
    assert t.num_rows >= 0
    assert set(t.column_names) == {"key", "partition_id",
                                   "constraint_name", "detail"}


ORACLE_NAMES = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, con):
    q = entrymod.queries()[name]
    got = _to_pandas(q(SF_DIR))
    want = con.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), \
        (sorted(got.columns), sorted(want.columns))
    assert len(got) == len(want), (name, len(got), len(want))
    assert _canon(got) == _canon(want), name


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    q = entrymod.queries()[name]
    got = _to_pandas(q(SF_DIR))
    assert len(got) >= 0
    for c in got.columns:
        assert got[c].notna().all() or len(got) == 0


def test_hll_estimate_close_to_exact(con):
    got = _to_pandas(entrymod.queries()["ndv_user_id_hll"](SF_DIR))
    exact = con.execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    est = got["ndv_estimate"].iloc[0]
    assert abs(est - exact) / exact < 0.05


def test_tdigest_quantiles_close_to_exact(con):
    got = _to_pandas(entrymod.queries()["value_quantiles_tdigest"](SF_DIR))
    for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        exact = con.execute(
            f"SELECT quantile_cont(value, {q}) FROM events").fetchone()[0]
        assert math.isfinite(got[col].iloc[0])
        assert abs(got[col].iloc[0] - exact) / max(exact, 1) < 0.05, col


def test_drift_self_passes():
    got = _to_pandas(entrymod.queries()["drift_events_self"](SF_DIR))
    assert bool(got["passed"].iloc[0])
    assert got["overall_psi"].iloc[0] < 1e-9
