"""Resumable partitioned-Parquet sink (brief: per-partition dirs +
skip-finished-partitions resume)."""

import os

import numpy as np
import pyarrow as pa
import ray
from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.sinks.parquet import (
    completed_partitions,
    read_partitioned,
    write_partitioned,
)


def _make_ds(n=1000):
    langs = np.array(["en", "de", "fr", "es", "zh"], dtype=object)
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array(langs[np.arange(n) % 5], pa.string()),
        "val": pa.array((np.arange(n) * 7) % 101, pa.int64()),
    })
    return t, ray.data.from_arrow(t)


def test_write_read_roundtrip_partitioned(tmp_path):
    t, ds = _make_ds()
    out = str(tmp_path / "out")
    summary = write_partitioned(ds, out, "lang", mode="overwrite")
    assert sorted(summary.column("partition").to_pylist()) == [
        "de", "en", "es", "fr", "zh"]
    assert sum(summary.column("n_rows").to_pylist()) == 1000
    # hive layout, one dir per partition, marker written
    assert os.path.exists(os.path.join(out, "lang=en", "_SUCCESS"))
    back = pa.concat_tables([
        ray.get(r) for r in arrow_block_refs(read_partitioned(out))])
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got[["doc_id", "lang", "val"]].equals(want)


def test_resume_skips_complete_rewrites_torn(tmp_path):
    _t, ds = _make_ds()
    out = str(tmp_path / "out")
    write_partitioned(ds, out, "lang", mode="overwrite")
    # complete run: continue mode writes nothing
    s2 = write_partitioned(ds, out, "lang", mode="continue")
    assert s2.num_rows == 0
    # torn partition: data present but marker missing -> redone, and
    # ONLY that partition is rewritten
    os.unlink(os.path.join(out, "lang=fr", "_SUCCESS"))
    before = {p: os.path.getmtime(os.path.join(out, f"lang={p}",
                                               "part-0.parquet"))
              for p in ["en", "de", "es", "zh"]}
    s3 = write_partitioned(ds, out, "lang", mode="continue")
    assert s3.column("partition").to_pylist() == ["fr"]
    assert completed_partitions(out, "lang") == {"en", "de", "fr", "es", "zh"}
    for p, mt in before.items():
        assert os.path.getmtime(os.path.join(out, f"lang={p}",
                                             "part-0.parquet")) == mt


def test_curation_to_partitioned_parquet(tmp_path, sf_dir):
    """The curated corpus lands as per-language parquet partitions —
    the composed export a training-data pipeline actually ships."""
    from mapchete_xarray_ray.pipelines.queries import q_corpus_curation

    cur = q_corpus_curation(sf_dir)
    out = str(tmp_path / "corpus")
    summary = write_partitioned(cur, out, "lang_pred", mode="overwrite")
    n = sum(summary.column("n_rows").to_pylist())
    back = pa.concat_tables([
        ray.get(r) for r in arrow_block_refs(read_partitioned(out))])
    assert back.num_rows == n > 0
    assert set(back.column("lang_pred").to_pylist()) <= {"de", "en", "es", "fr"}


def test_overwrite_clears_stale_partitions(tmp_path):
    """A partition absent from the new dataset must not survive an
    overwrite with a valid marker (stale-data hazard)."""
    t, ds = _make_ds()
    out = str(tmp_path / "out")
    write_partitioned(ds, out, "lang", mode="overwrite")
    smaller = ray.data.from_arrow(t.filter(
        pa.compute.not_equal(t.column("lang"), "zh")))
    write_partitioned(smaller, out, "lang", mode="overwrite")
    assert completed_partitions(out, "lang") == {"en", "de", "fr", "es"}
    back = pa.concat_tables([
        ray.get(r) for r in arrow_block_refs(read_partitioned(out))])
    assert "zh" not in set(back.column("lang").to_pylist())


def test_marker_without_data_is_redone(tmp_path):
    """_SUCCESS without a data file is NOT complete: the partition is
    rewritten, not silently skipped."""
    _t, ds = _make_ds()
    out = str(tmp_path / "out")
    write_partitioned(ds, out, "lang", mode="overwrite")
    os.unlink(os.path.join(out, "lang=de", "part-0.parquet"))
    assert "de" not in completed_partitions(out, "lang")
    s = write_partitioned(ds, out, "lang", mode="continue")
    assert s.column("partition").to_pylist() == ["de"]


def test_export_keeps_text(tmp_path, sf_dir):
    """The exported corpus carries the curated TEXT (an export without
    document content is not a training corpus)."""
    import ray.data as rd

    from mapchete_xarray_ray.pipelines.queries import curation_pipeline

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    cur = curation_pipeline(docs, keep_text=True)
    out = str(tmp_path / "corpus")
    write_partitioned(cur, out, "lang_pred", mode="overwrite")
    back = pa.concat_tables([
        ray.get(r) for r in arrow_block_refs(read_partitioned(out))])
    assert "text" in back.column_names and back.num_rows > 0
    assert min(len(t) for t in back.column("text").to_pylist()) >= 100


def test_partition_values_are_path_escaped(tmp_path):
    """A partition value containing '/', '..' or '=' must stay inside
    its own hive directory (percent-encoded) and still resume
    correctly."""
    import os

    from mapchete_xarray_ray.sinks.parquet import (
        completed_partitions,
        read_partitioned,
        write_partitioned,
    )

    evil = ["../escape", "a/b", "k=v", "ok"]
    tbl = pa.table({
        "val": pa.array(list(range(8)), pa.int64()),
        "part": pa.array(evil * 2, pa.string()),
    })
    out = str(tmp_path / "sink")
    summary = write_partitioned(ray.data.from_arrow(tbl), out, "part",
                                mode="overwrite")
    assert sorted(summary.column("partition").to_pylist()) == sorted(evil)
    # nothing escaped the sink root; every dir is a direct child
    assert not (tmp_path / "escape").exists()
    for name in os.listdir(out):
        assert name.startswith("part=") and "/" not in name
    # resume sees the DECODED values and skips everything
    assert completed_partitions(out, "part") == set(evil)
    again = write_partitioned(ray.data.from_arrow(tbl), out, "part",
                              mode="continue")
    assert again.num_rows == 0
    back = pa.concat_tables([
        ray.get(r) for r in arrow_block_refs(read_partitioned(out))])
    assert sorted(back.column("val").to_pylist()) == list(range(8))
