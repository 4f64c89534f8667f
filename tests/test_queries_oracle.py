"""Every REGISTRY query with an SQL twin must match DuckDB row-exactly
(the same check the driver runs at sf0.01, here at sf0.001)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray
from mapchete_xarray_ray.collect import arrow_block_refs

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
        res = pa.concat_tables([ray.get(r) for r in arrow_block_refs(res)])
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


def test_kmv_sketch_batching_invariant(sf_dir):
    """The KMV sketch must be a pure function of the DISTINCT key set —
    batch layout must not change the merged sketch or its estimate, and
    the estimate must be in the right ballpark of the exact count."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    fn = REGISTRY["distinct_users_sketch"][0]
    t1 = fn(sf_dir)
    exact = len(np.unique(pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id"])
        .column("user_id").to_numpy()))
    est = t1.column("est_users")[0].as_py()
    # deterministic hash + fixed k: re-running yields the identical row
    t2 = fn(sf_dir)
    assert t1.equals(t2)
    # KMV with k=16 has ~26% relative stderr; 2.5 sigma window
    assert 0.35 * exact <= est <= 1.65 * exact, (est, exact)


def test_top_terms_df_edge_cases(tmp_path):
    """Empty and whitespace-only docs contribute no terms; per-doc
    dedup means df counts documents, not occurrences; ties break by
    term ascending."""
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import q_top_terms_df

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b a", "", "   ", "b c"], pa.string())}),
        str(tmp_path / "documents.parquet"))
    t = q_top_terms_df(str(tmp_path))
    rows = list(zip(t.column("term").to_pylist(),
                    t.column("df").to_pylist()))
    assert rows == [("b", 2), ("a", 1), ("c", 1)]


def test_cms_overestimates_and_is_batching_invariant(sf_dir):
    """Count-Min estimates are >= the exact per-user counts (the CMS
    one-sided error guarantee), exact where no collision occurs, and
    a pure function of the multiset of user ids."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    fn = REGISTRY["heavy_hitters_cms"][0]
    t1 = fn(sf_dir)
    u = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id"]).column("user_id").to_numpy()
    ids, cnt = np.unique(u, return_counts=True)
    exact = dict(zip(ids.tolist(), cnt.tolist()))
    assert t1.num_rows == len(ids)
    over = 0
    for i in range(t1.num_rows):
        uid = t1.column("user_id")[i].as_py()
        est = t1.column("est_n")[i].as_py()
        assert est >= exact[uid], uid
        over += est > exact[uid]
    # w=512 rows x 4 salts over ~150 users: most estimates exact
    assert over <= t1.num_rows // 2
    assert t1.equals(fn(sf_dir))  # deterministic


def test_events_late_has_signal_and_matches_sequential(sf_dir):
    """The late-data side-output must be NON-EMPTY (a monotone arrival
    model silently classifies nothing as late — the regression this
    guards) and must equal a sequential single-pass watermark scan."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    got = _to_pandas(REGISTRY["events_late"][0](sf_dir))
    assert len(got) > 0

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "ts", "user_id"])
    e = t.column("event_id").to_numpy()
    ts = t.column("ts").cast(pa.int64()).to_numpy()
    arr = ts + ((e % 1000003) * 2654435761) % 600000001 - 300000000
    order = np.lexsort((e, arr))
    e_s, ts_s = e[order], ts[order]
    run = np.maximum.accumulate(ts_s)
    prior = np.concatenate(([np.iinfo(np.int64).min // 4],
                            run[:-1]))
    wm = prior - 120_000_000
    late = ts_s < wm
    want = pd.DataFrame({
        "event_id": e_s[late],
        "ts_us": ts_s[late],
        "late_by_us": wm[late] - ts_s[late],
    })
    got2 = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got2["event_id"].tolist() == want["event_id"].tolist()
    assert got2["ts_us"].tolist() == want["ts_us"].tolist()
    assert got2["late_by_us"].tolist() == want["late_by_us"].tolist()


def test_lang_rebalance_null_lang_drops_on_both_sides(tmp_path):
    """NULL lang must drop out of the rebalance (the twin's inner
    JOIN USING (lang) semantics), not crash the rate-table build —
    the shipped fixtures carry no NULLs, so this supplies the edge."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import (
        REGISTRY,
        SQL_LANG_REBALANCE,
        collect_table,
    )

    n = 40
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["w " * 5] * n),
        "lang": pa.array([None if i % 10 == 0 else ("en" if i % 3 else "de")
                          for i in range(n)], pa.string()),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(np.full(n, 10, np.int64)),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = collect_table(REGISTRY["lang_rebalance"][0](str(tmp_path)))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(SQL_LANG_REBALANCE).fetchdf()
    con.close()
    g = sorted(zip(got.column("doc_id").to_pylist(),
                   got.column("lang").to_pylist()))
    w = sorted(zip(want["doc_id"].tolist(), want["lang"].tolist()))
    assert g == w
    assert all(lang is not None for _d, lang in g)
    assert 0 < len(g) < n


def test_price_quantile_sketch_within_one_bin(sf_dir):
    """The binned sketch's guarantee: every estimate is a bin lower
    bound at most one bin width below the exact rank-target value."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY, collect_table

    got = collect_table(REGISTRY["price_quantile_sketch"][0](sf_dir))
    cents = np.floor(pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice"]).column("l_extendedprice")
        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
    cents.sort()
    binw = (int(cents.max()) - int(cents.min()) + 1) / 4096
    for q, target, est in zip(got.column("q_permille").to_pylist(),
                              got.column("rank_target").to_pylist(),
                              got.column("est_cents").to_pylist()):
        exact = int(cents[target - 1])
        assert est <= exact, (q, est, exact)
        assert exact - est <= binw + 1, (q, est, exact, binw)


def test_empty_tables_yield_empty_results(tmp_path):
    """Zero-row inputs produce zero-block reads; the driver folds in
    centroid_classify / price_quantile_sketch must emit the empty
    schema instead of crashing on zero-size reductions."""
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY, collect_table

    pq.write_table(pa.table({"l_extendedprice": pa.array([], pa.float64())}),
                   str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    r1 = collect_table(REGISTRY["price_quantile_sketch"][0](str(tmp_path)))
    r2 = collect_table(REGISTRY["centroid_classify"][0](str(tmp_path)))
    assert r1.num_rows == 0
    assert r2.num_rows == 0


def test_bpe_merges_overlapping_runs_match_duckdb(tmp_path):
    """The merge loop's exactness hinges on all three engines replacing
    non-overlapping left-to-right ('aaaa' + merge aa->X == 'XX', never
    'aXa'); the fixture corpus has no such runs, so supply them."""
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import (
        REGISTRY,
        SQL_BPE_MERGES,
        collect_table,
    )

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["aaa aaa aaaa", "aab aaab", "  "]),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = collect_table(REGISTRY["bpe_merges"][0](str(tmp_path)))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(SQL_BPE_MERGES).fetchall()
    con.close()
    g = sorted(zip(got.column("round").to_pylist(),
                   got.column("pair").to_pylist(),
                   got.column("cnt").to_pylist()))
    # sort both sides by round: SQL does not guarantee UNION ALL
    # branch order (the driver's hash compare sorts rows too)
    assert g == sorted(tuple(r) for r in want)
    # round 0 merges the dominant 'aa'; 'aaaa' must count it twice
    # (left-to-right non-overlap), visible in the round-1 alphabet
    assert g[0][1] == "aa"


def test_bpe_exhausted_rounds_match_duckdb(tmp_path):
    """A corpus whose mergeable pairs run out before round 3: python's
    _learn_bpe breaks early, and the SQL chain's coalesce-to-'' must
    make the remaining replaces no-ops instead of NULLing every word
    (replace(w, NULL, x) is NULL in DuckDB)."""
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import (
        REGISTRY,
        SQL_BPE_ENCODE,
        SQL_BPE_MERGES,
        collect_table,
    )

    # round 0 merges 'ab'; afterwards words are single symbols ->
    # rounds 1 and 2 find nothing
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ab ab", "ab", "a"]),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")

    got_m = collect_table(REGISTRY["bpe_merges"][0](str(tmp_path)))
    want_m = con.execute(SQL_BPE_MERGES).fetchall()
    assert sorted(zip(got_m.column("round").to_pylist(),
                      got_m.column("pair").to_pylist(),
                      got_m.column("cnt").to_pylist())) \
        == sorted(tuple(r) for r in want_m) == [(0, "ab", 3)]

    got_e = collect_table(REGISTRY["bpe_encode"][0](str(tmp_path)))
    want_e = sorted(con.execute(SQL_BPE_ENCODE).fetchall())
    con.close()
    g = sorted(zip(got_e.column("doc_id").to_pylist(),
                   got_e.column("n_tokens").to_pylist(),
                   got_e.column("n_symbols").to_pylist(),
                   got_e.column("n_raw_chars").to_pylist()))
    assert g == [tuple(r) for r in want_e]
    assert g == [(0, 2, 2, 4), (1, 1, 1, 2), (2, 1, 1, 1)]
