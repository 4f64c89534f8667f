"""Simulate the driver's correctness gate: run every registry query at
a given sf dir and hash-compare against its DuckDB oracle SQL twin.

Usage: python tools/driver_check.py [--json OUT.json] [sf_dir] [query ...]
(defaults: /root/testdata/sf0.01, all queries)

--json writes the full per-query result map to a file — the per-round
full-registry witness VERDICT r4 asked to record alongside
CORRECTNESS_rNN.json (the driver itself gates only the first 50
registry slots).
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
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("-"):
            sys.exit("--json requires an output path argument")
        json_out = argv[i + 1]
        if os.path.isdir(json_out):
            sys.exit(f"--json target {json_out!r} is a directory")
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
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
    fails, results = [], {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            fails.append(name)
            results[name] = {"err": repr(ex)}
            print(f"{name}: ERROR {ex!r}")
            continue
        dt = time.perf_counter() - t0
        sql = sqls.get(name)
        if sql is None:
            results[name] = {"rows_only": len(mine), "err": None,
                             "sec": round(dt, 2)}
            print(f"{name}: rows-only ({len(mine)} rows) [{dt:.2f}s]")
            continue
        oracle = con.execute(sql).fetchdf()
        rows = len(mine) == len(oracle)
        schema = sorted(mine.columns) == sorted(oracle.columns)
        h = value_hash(mine) == value_hash(oracle) if rows and schema else False
        status = "PASS" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": h, "ray_rows": len(mine),
                         "oracle_rows": len(oracle), "err": None,
                         "sec": round(dt, 2)}
        print(f"{name}: {status} rows={len(mine)}/{len(oracle)} "
              f"schema={schema} hash={h} [{dt:.2f}s]")
    print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + str(fails)}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n": len(results),
                       "failures": fails, "results": results}, f, indent=1)
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
