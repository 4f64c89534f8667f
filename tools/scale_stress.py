"""Scale-stress receipts: run the three headline shapes at 10x the
per-round bench scale and record wall time, PEAK DRIVER RSS and
object-store spill — the evidence that the no-driver-materialization
story holds when blocks stop fitting in memory.

    python tools/scale_stress.py flagship|curation|dedup   # one shape
    python tools/scale_stress.py --all                     # all three,
                                                           # fresh process each

Shapes (inputs synthesized deterministically, no external data):
- flagship: 10M pages (GRAFT_STRESS_PAGES) -> extract/assign/rasterize
  -> tile archive; the tile groupby is the all-to-all under test.
- curation: the curation chain (lang-ID, quality, exact dedup,
  deterministic sample) over the same 10M pages as documents.
- dedup: dedup_canonical (PPJoin exact n-gram Jaccard -> distributed
  connected components -> anti-join) over a 50k-doc corpus built as
  10 perturbed replicas of sf0.1/documents.parquet — every doc gains
  9 near-identical twins, the worst realistic duplicate structure for
  the candidate-pair stages.

Receipts: driver ru_maxrss (the DRIVER process only — worker memory is
the object store's budget, and spill is how pressure there shows up),
and the "Spilled"/"Plasma memory usage" lines of Ray's own memory
summary.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRESS_PAGES = int(os.environ.get("GRAFT_STRESS_PAGES", "10000000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
DEDUP_REPLICAS = int(os.environ.get("GRAFT_STRESS_REPLICAS", "10"))


def _spill_lines() -> list[str]:
    try:
        from ray._private.internal_api import memory_summary

        txt = memory_summary(stats_only=True)
        return [ln.strip() for ln in txt.splitlines()
                if "Spilled" in ln or "Plasma memory usage" in ln
                or "Objects consumed" in ln]
    except Exception:
        pass
    # no grpc in this container: read the spill directory directly —
    # object-store pressure shows up as files under
    # /tmp/ray/session_*/ray_spilled_objects
    import glob

    files = glob.glob("/tmp/ray/session_latest/ray_spilled_objects*/**",
                      recursive=True)
    files = [f for f in files if os.path.isfile(f)]
    total = sum(os.path.getsize(f) for f in files)
    return [f"spilled_files={len(files)} spilled_bytes={total}"]


def _dedup_corpus(path: str) -> str:
    """50k-doc deterministic corpus: DEDUP_REPLICAS near-identical
    copies of each sf0.1 document (a replica tag appended, ids offset).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = os.path.join(path, "documents.parquet")
    if os.path.exists(out):
        return path
    os.makedirs(path, exist_ok=True)
    base = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                         columns=["doc_id", "text"])
    reps = []
    for k in range(DEDUP_REPLICAS):
        reps.append(pa.table({
            "doc_id": pc.add(base.column("doc_id"), k * 10_000_000),
            "text": pc.binary_join_element_wise(
                base.column("text"), f" replica{k}", ""),
        }))
    pq.write_table(pa.concat_tables(reps), out)
    return path


def run_shape(shape: str) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    import bench

    t_prep = time.perf_counter()
    if shape in ("flagship", "curation"):
        pages_path = f"/tmp/mxr_stress_pages_{STRESS_PAGES}"
        bench.synth_pages_parquet(STRESS_PAGES, pages_path)
    else:
        # replica count in the cache path: a rerun with a different
        # GRAFT_STRESS_REPLICAS must not reuse (and mis-report) the
        # previous corpus
        corpus = _dedup_corpus(
            f"/tmp/mxr_stress_corpus_x{DEDUP_REPLICAS}")
    prep_s = time.perf_counter() - t_prep

    t0 = time.perf_counter()
    if shape == "flagship":
        import shutil

        from mapchete_xarray_ray.pipelines.flagship import (
            default_spec,
            run_pipeline,
        )

        out_path = "/tmp/mxr_stress_out.zarr"
        shutil.rmtree(out_path, ignore_errors=True)
        spec = default_spec(out_path, zoom=7)
        ds = ray.data.read_parquet(
            pages_path, columns=["url", "warc_ts", "html", "lang"])
        rows = 0
        for b in run_pipeline(ds, spec, mode="overwrite").iter_batches(
                batch_size=8192, batch_format="pyarrow"):
            rows += b.num_rows
        unit, n_in = "pages", STRESS_PAGES
    elif shape == "curation":
        import numpy as np
        import pyarrow as pa

        from mapchete_xarray_ray.functions.geocode import stable_hash64
        from mapchete_xarray_ray.pipelines.queries import curation_pipeline

        def to_docs(batch: pa.Table) -> pa.Table:
            h = (stable_hash64(batch.column("url").to_numpy(
                zero_copy_only=False)) % np.uint64(2 ** 31)).astype(np.int64)
            return pa.table({"doc_id": pa.array(h),
                             "text": batch.column("text")})

        ds = ray.data.read_parquet(pages_path, columns=["url", "text"])
        cur = curation_pipeline(ds.map_batches(to_docs,
                                               batch_format="pyarrow"))
        rows = 0
        for b in cur.iter_batches(batch_size=8192, batch_format="pyarrow"):
            rows += b.num_rows
        unit, n_in = "docs", STRESS_PAGES
    elif shape == "dedup":
        from mapchete_xarray_ray.pipelines.queries import REGISTRY

        fn, _sql = REGISTRY["dedup_canonical"]
        res = fn(corpus)
        rows = res.num_rows if hasattr(res, "num_rows") else res.count()
        import pyarrow.parquet as pq

        # actual corpus row count, not an assumption about the fixture
        unit = "docs"
        n_in = pq.ParquetFile(
            os.path.join(corpus, "documents.parquet")).metadata.num_rows
    else:
        raise SystemExit(f"unknown shape {shape!r}")
    wall = time.perf_counter() - t0

    rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2 ** 20
    print(json.dumps({
        "shape": shape, "num_cpus": NUM_CPUS,
        "input": n_in, "unit": unit, "rows_out": int(rows),
        "prep_sec": round(prep_s, 1), "wall_sec": round(wall, 1),
        f"{unit}_per_sec": round(n_in / wall, 1),
        "driver_peak_rss_gib": round(rss_gib, 2),
        "spill": _spill_lines(),
    }))
    ray.shutdown()


def main():
    if "--all" in sys.argv:
        for shape in ("flagship", "curation", "dedup"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), shape],
                capture_output=True, text=True)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            print(line)
            if r.returncode:
                sys.stderr.write(r.stderr[-2000:])
                sys.exit(r.returncode)
        return
    run_shape(sys.argv[1])


if __name__ == "__main__":
    main()
