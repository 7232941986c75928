#!/usr/bin/env python
"""Profile the point-lookup decode path breakdown at bench size.

Measures, on one encoded web run:
  - full decode (count)
  - fused_prune metadata job alone (collect happens inside)
  - decode scan alone on the pruned stripes
  - driver-side fixed pieces (recover_swap, colocated check, plan build)
Run: python scripts/profile_plk.py [rows]
"""
import os
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    web_path = bench.ensure_web_parquet(rows)
    spark = bench.make_session(bench.MAIN_CORES)
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_workers(spark, bench.MAIN_CORES)

    sec, bi, bo, out_dir, run_id = bench.encode_web_job(
        spark, web_path, bench.MAIN_CORES, "plkprof"
    )
    print(f"encode: {sec:.2f}s  bytes_in={bi}")

    from orc_spark.engine import pipeline, zonemap

    df = spark.read.parquet(web_path)
    schema = df.schema
    probe_url = df.select("url").first().url
    pred = [("url", "==", probe_url)]

    for it in range(3):
        t0 = time.perf_counter()
        n = pipeline.decode_job(spark, out_dir, run_id, schema).count()
        print(f"full_decode[{it}]: {time.perf_counter()-t0:.3f}s rows={n}")

    for it in range(3):
        t0 = time.perf_counter()
        n = (
            pipeline.decode_job(spark, out_dir, run_id, schema, predicate=pred)
            .filter(zonemap.predicate_expr(pred))
            .count()
        )
        print(f"point_lookup[{it}]: {time.perf_counter()-t0:.3f}s rows={n}")

    # breakdown
    want = set(f.name for f in schema.fields)
    for it in range(3):
        t0 = time.perf_counter()
        all_stripes = pipeline.read_stripes(spark, out_dir, run_id)
        t1 = time.perf_counter()
        colocated = pipeline._stripe_files_fit_one_task_each(spark, out_dir)
        t2 = time.perf_counter()
        sdir = os.path.join(out_dir, "stripes")
        stripes = zonemap.fused_prune(all_stripes, want, pred, stripes_path=sdir)
        t3 = time.perf_counter()
        from orc_spark.engine import decode as decode_mod

        n = (
            decode_mod.decode_stage(
                stripes, schema, None, colocated, residual=pred
            )
            .filter(zonemap.predicate_expr(pred))
            .count()
        )
        t4 = time.perf_counter()
        print(
            f"breakdown[{it}]: read_stripes={t1-t0:.3f} coloc={t2-t1:.3f} "
            f"fused_prune={t3-t2:.3f} decode+count={t4-t3:.3f} rows={n}"
        )

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
