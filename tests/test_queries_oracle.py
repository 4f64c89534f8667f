"""Every REGISTRY query with an SQL twin must match DuckDB row-exactly
(the same check the driver runs at sf0.01, here at sf0.001)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray

from mapchete_xarray_ray.pipelines.queries import REGISTRY

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, ray.data.Dataset):
        res = pa.concat_tables([ray.get(r) for r in res.to_arrow_refs()])
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", [n for n, (_f, s) in REGISTRY.items() if s])
def test_query_matches_duckdb(name, sf_dir):
    fn, sql = REGISTRY[name]
    got = _normalize(_to_pandas(fn(sf_dir)))
    con = _duck(sf_dir)
    want = _normalize(con.execute(sql).fetch_df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
