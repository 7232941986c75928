"""spark-submit entry for the encode pipeline.

The north rule's deployment mechanism: the package ships as a zip via
``--py-files`` and this flat driver script runs the resumable encode
job on the cluster, e.g.::

    spark-submit --master local[8] --py-files /tmp/orc_spark.zip \
        scripts/submit_encode.py --input /data/web.parquet \
        --out /data/encoded --run-id run1 --partitions 64 [--verify]

On a real cluster only ``--master`` changes (yarn/k8s): the job is
partition-parallel with one explicit salted shuffle, so executors
scale it horizontally. Prints one JSON line with the run result
(mirrors the reference's run-result.json,
/root/reference/internal/state/runresult.go:11-32).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--key", default="url")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--waves", type=int, default=1)
    p.add_argument("--cluster-by", default=None)
    p.add_argument("--compression", choices=["zlib", "none"], default="zlib")
    p.add_argument("--compression-level", type=int, default=1)
    p.add_argument("--stripe-rows", type=int, default=None)
    p.add_argument("--verify", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"orc-spark-encode-{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # One Arrow batch = one stripe (~100 MB at 64k web rows)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    # imported AFTER session start: the package arrives via --py-files
    from orc_spark.engine import lineage, pipeline

    df = spark.read.parquet(args.input)
    cfg = pipeline.EncodeJobConfig(
        out_dir=args.out,
        run_id=args.run_id,
        key=args.key,
        n_partitions=args.partitions or pipeline.suggest_partitions(spark, df),
        waves=args.waves,
        cluster_by=args.cluster_by,
        compression=None if args.compression == "none" else args.compression,
        compression_level=args.compression_level,
        stripe_rows=args.stripe_rows,
    )
    res = pipeline.run_encode_job(spark, df, cfg)
    out = {
        "run_id": res.run_id,
        "status": "completed",
        "partitions_total": res.partitions_total,
        "partitions_skipped": res.partitions_skipped,
        "partitions_encoded": res.partitions_encoded,
        "columns": res.columns,
    }
    lin = lineage.read_lineage(spark, args.out)
    from pyspark.sql import functions as F

    agg = lin.filter(F.col("run_id") == args.run_id).agg(
        F.sum("bytes_in").alias("bi"), F.sum("bytes_out").alias("bo")
    ).first()
    out["bytes_in"], out["bytes_out"] = int(agg.bi), int(agg.bo)

    rc = 0
    if args.verify:
        dec = pipeline.decode_job(spark, args.out, args.run_id, df.schema)
        v = pipeline.verify_roundtrip(df, dec, args.key)
        out["verify"] = v
        if v["missing_from_decoded"] or v["extra_in_decoded"] or (
            v["count_original"] != v["count_decoded"]
        ):
            out["status"] = "verify_failed"
            rc = 3
    print(json.dumps(out))
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
