"""Driver-mimic: run every queries() entry at sf0.01 and compare with
its oracle_sql() twin via DuckDB (row count + column names + order-
insensitive value hash), matching the external driver's gate.  Usage:
    python tools/oracle_check.py [name ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable") \
             .reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for col in df.columns:
        vals = df[col]
        if pd.api.types.is_float_dtype(vals):
            vals = vals.round(9)
        h.update(repr(vals.tolist()).encode())
    return h.hexdigest()[:16]


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("ORACLE_CPUS", "16")),
                 include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            out = fn(SF_DIR)
            if isinstance(out, pa.Table):
                got = out.to_pandas()
            elif hasattr(out, "iter_batches"):
                parts = [b for b in out.iter_batches(batch_format="pandas")]
                got = pd.concat(parts) if parts else pd.DataFrame()
            else:
                got = out
            if name not in oracles:
                results[name] = {"rows": len(got), "oracle": None}
                print(f"{name:36s} rows={len(got):6d}  (no oracle)")
                continue
            want = con.execute(oracles[name]).df()
            g, w = canon(got), canon(want)
            ok_rows = len(g) == len(w)
            ok_schema = list(g.columns) == list(w.columns)
            ok_hash = ok_rows and ok_schema and value_hash(g) == value_hash(w)
            results[name] = {"rows": len(g), "oracle_rows": len(w),
                             "rows_match": ok_rows, "schema_match": ok_schema,
                             "hash_match": ok_hash}
            tag = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
            print(f"{name:36s} {tag} rows={len(g)}/{len(w)} "
                  f"schema={ok_schema} hash={ok_hash}")
            if tag == "FAIL":
                print("   got cols:", list(g.columns))
                print("  want cols:", list(w.columns))
                if ok_rows and ok_schema:
                    neq = (g != w) & ~(g.isna() & w.isna())
                    bad = neq.any(axis=1)
                    print(g[bad].head(3))
                    print(w[bad].head(3))
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": repr(ex)[:200]}
            print(f"{name:36s} ERR {ex!r}"[:200])
    n_fail = sum(1 for r in results.values()
                 if r.get("hash_match") is False or "err" in r)
    print(f"\n{len(results)} queries, {n_fail} failing")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
