"""Run-report builder — the reference's ``orc report`` re-expressed
(/root/reference/internal/report/report.go:69-366: joins timing+costs+
metadata into markdown/JSON with schema_version 1). Ours joins the
lineage ledger into a per-run markdown/JSON summary."""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from . import lineage as lineage_mod
from . import metrics

SCHEMA_VERSION = 1


def build_report(spark: SparkSession, out_dir: str, run_id: str) -> dict:
    """JSON-able run report from the lineage ledger."""
    lin = lineage_mod.read_lineage(spark, out_dir).filter(f"run_id = '{run_id}'")
    lin.cache()
    try:
        summary = metrics.run_summary(lin).collect()
        by_col = metrics.compression_by_column(lin).collect()
        by_codec = metrics.compression_by_codec(lin).collect()
        rate = metrics.success_rate(lin).first()
    finally:
        lin.unpersist()
    if not summary:
        return {"schema_version": SCHEMA_VERSION, "run_id": run_id, "found": False}
    s = summary[0]
    return {
        "schema_version": SCHEMA_VERSION,
        "run_id": run_id,
        "found": True,
        "n_partitions": s.n_partitions,
        "bytes_in": s.bytes_in,
        "bytes_out": s.bytes_out,
        "ratio": round(s.ratio, 4),
        "started": str(s.started),
        "finished": str(s.finished),
        "success_pct": round(rate.success_pct, 2),
        "avg_encode_ms": round(rate.avg_encode_ms, 3),
        "p95_encode_ms": round(rate.p95_encode_ms, 3),
        "columns": [
            {
                "column": r.column,
                "bytes_in": r.bytes_in,
                "bytes_out": r.bytes_out,
                "ratio": round(r.ratio, 4),
                "mb_per_s": round(r.mb_per_s, 2),
            }
            for r in by_col
        ],
        "codecs": [
            {
                "codec": r.codec,
                "n_stripes": r.n_stripes,
                "bytes_in": r.bytes_in,
                "bytes_out": r.bytes_out,
                "ratio": round(r.ratio, 4),
            }
            for r in by_codec
        ],
    }


def to_markdown(report: dict) -> str:
    """Markdown rendering (≙ report.go's markdown writer)."""
    if not report.get("found"):
        return f"# Run {report['run_id']}\n\n_No lineage found._\n"
    lines = [
        f"# Encode run `{report['run_id']}`",
        "",
        f"- partitions: **{report['n_partitions']}**",
        f"- bytes: **{report['bytes_in']:,} → {report['bytes_out']:,}**"
        f" (ratio **{report['ratio']:.2f}×**)",
        f"- success: **{report['success_pct']:.1f}%**",
        f"- encode ms avg/p95: **{report['avg_encode_ms']:.1f} / "
        f"{report['p95_encode_ms']:.1f}**",
        f"- window: {report['started']} → {report['finished']}",
        "",
        "## By column",
        "",
        "| column | bytes in | bytes out | ratio | MB/s |",
        "|---|---:|---:|---:|---:|",
    ]
    for c in report["columns"]:
        lines.append(
            f"| {c['column']} | {c['bytes_in']:,} | {c['bytes_out']:,} "
            f"| {c['ratio']:.2f} | {c['mb_per_s']:.1f} |"
        )
    lines += ["", "## By codec", "", "| codec | stripes | bytes in | ratio |", "|---|---:|---:|---:|"]
    for c in report["codecs"]:
        lines.append(
            f"| {c['codec']} | {c['n_stripes']} | {c['bytes_in']:,} | {c['ratio']:.2f} |"
        )
    return "\n".join(lines) + "\n"


def render(report: dict, fmt: str = "markdown") -> str:
    if fmt == "json":
        return json.dumps(report, indent=2)
    return to_markdown(report)
