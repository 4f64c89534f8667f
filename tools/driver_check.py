"""Simulate the driver's correctness gate: run every registry query at
a given sf dir and hash-compare against its DuckDB oracle SQL twin.

Usage: python tools/driver_check.py [sf_dir] [query ...]
(defaults: /root/testdata/sf0.01, all queries)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # script lives in tools/
from mapchete_xarray_ray.collect import arrow_block_refs  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    if isinstance(res, ray.data.Dataset):
        tabs = [t for t in (ray.get(r) for r in arrow_block_refs(res))
                if t.num_columns > 0]
        res = pa.concat_tables(tabs) if tabs else pa.table({})
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, sqls = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            fails.append(name)
            print(f"{name}: ERROR {ex!r}")
            continue
        dt = time.perf_counter() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(mine)} rows) [{dt:.2f}s]")
            continue
        oracle = con.execute(sql).fetchdf()
        rows = len(mine) == len(oracle)
        schema = sorted(mine.columns) == sorted(oracle.columns)
        h = value_hash(mine) == value_hash(oracle) if rows and schema else False
        status = "PASS" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name}: {status} rows={len(mine)}/{len(oracle)} "
              f"schema={schema} hash={h} [{dt:.2f}s]")
    print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + str(fails)}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
