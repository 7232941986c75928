"""Doctor: deterministic failure diagnosis + environment sanity.

≙ the reference's `orc doctor` (/root/reference/internal/doctor/
doctor.go:46-85): gather the failed run's context — phase config,
logs, feedback, timing, loop counts — and produce actionable advice.
The reference ships that context to an LLM; this engine's failure
surface is structured (the lineage ledger's status/failure_category/
epoch columns), so the diagnosis is rule-based and reproducible —
no model call, same job: "what failed, why, what to run next".
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import lineage as lineage_mod


def environment_report() -> dict:
    """Sanity of everything the engine needs to run."""
    import importlib.util
    import os
    import shutil

    out: dict = {}
    try:
        import pyspark

        out["pyspark"] = pyspark.__version__
    except Exception as exc:  # pragma: no cover
        out["pyspark"] = f"MISSING ({exc})"
    try:
        import pyarrow

        out["pyarrow"] = pyarrow.__version__
    except Exception as exc:  # pragma: no cover
        out["pyarrow"] = f"MISSING ({exc})"
    out["java_home"] = os.environ.get("JAVA_HOME") or (
        "on PATH" if shutil.which("java") else "MISSING"
    )
    try:
        from ..codecs import fsst

        out["native_fsst_kernel"] = bool(getattr(fsst, "_lib", None)) or (
            "compiled-on-demand"
            if importlib.util.find_spec("ctypes")
            else "ctypes missing"
        )
    except Exception as exc:  # pragma: no cover
        out["native_fsst_kernel"] = f"unavailable ({exc})"
    return out


def _storage_notes(out_dir: str) -> list[str]:
    """Interrupted-rewrite leftovers (retention/vacuum two-rename swap
    windows) — readable state, but worth surfacing: a parked `_old`
    copy means a rewrite crashed and the next read will restore it."""
    import os

    from . import retention

    notes = []
    for path in (
        lineage_mod.stripes_dir(out_dir),
        lineage_mod.lineage_dir(out_dir),
    ):
        name = os.path.basename(path)
        for suf in (retention._SWAP_OLD, *retention._LEGACY_OLD_SUFFIXES):
            if os.path.exists(path + suf):
                notes.append(
                    f"{name}{suf} present: a retention/vacuum rewrite was "
                    "interrupted mid-swap; any engine read (or "
                    "retention.recover_swap) restores/cleans it"
                )
        for suf in retention._SWAP_TMP_SUFFIXES:
            if os.path.exists(path + suf):
                notes.append(
                    f"{name}{suf} present: leftover rewrite temp dir — "
                    "never authoritative; recover_swap deletes it"
                )
        lock = path + retention._LOCK_SUFFIX
        if os.path.exists(lock):
            state = (
                "STALE (holder dead/aged out — the next writer breaks it)"
                if retention._lock_is_stale(lock)
                else "live (a rewrite is running; writers will queue)"
            )
            notes.append(f"{name}{retention._LOCK_SUFFIX} present: {state}")
    return notes


def diagnose_run(spark: SparkSession, out_dir: str, run_id: str | None = None) -> dict:
    """Rule-based failure diagnosis over the lineage ledger."""
    storage_notes = _storage_notes(out_dir)
    lin = lineage_mod.read_lineage(spark, out_dir)
    if run_id:
        lin = lin.filter(F.col("run_id") == run_id)
    if lin.limit(1).count() == 0:
        out = {"found": False, "advice": ["no lineage for this run_id/out_dir"]}
        if storage_notes:
            out["storage_notes"] = storage_notes
        return out

    by_run = {}
    runs = [r.run_id for r in lin.select("run_id").distinct().collect()]
    for rid in sorted(runs):
        rl = lin.filter(F.col("run_id") == rid)
        max_epoch = rl.agg(F.max("epoch")).first()[0]
        latest = rl.filter(F.col("epoch") == max_epoch)
        failed = (
            latest.filter(F.col("status") == "failed")
            .groupBy("partition_id", "column", "failure_category")
            .count()
            .collect()
        )
        entry: dict = {
            "max_epoch": int(max_epoch),
            "failed_stripes_latest_epoch": len(failed),
        }
        if failed:
            cats = sorted({r.failure_category for r in failed})
            pids = sorted({int(r.partition_id) for r in failed})
            cols = sorted({r.column for r in failed})
            entry["failure_categories"] = cats
            entry["failed_partitions"] = pids
            entry["failed_columns"] = cols
            advice = [
                f"re-run the same encode command (run_id {rid!r}): "
                f"{len(pids)} partition(s) re-encode whole at epoch "
                f"{int(max_epoch) + 1}; completed partitions are skipped",
            ]
            if "resource_exhausted" in cats:
                advice.append(
                    "resource_exhausted: lower stripe_rows or raise "
                    "n_partitions before resuming"
                )
            if "codec_error" in cats or "validation_error" in cats:
                advice.append(
                    "codec/validation errors: check the overrides chain for "
                    + ", ".join(cols)
                    + " (raw always succeeds)"
                )
            if "injected_fault" in cats:
                advice.append(
                    "injected_fault: a fault_spec is still set — remove it "
                    "before resuming"
                )
            entry["advice"] = advice
        else:
            entry["advice"] = ["all stripes completed at the latest epoch"]
        # layout advisory: a fragmented run (many small stripes from
        # incremental appends / resumes) taxes every later read — the
        # stripe count is metadata the ledger already holds, so the
        # check is free. Thresholds are deliberately coarse: this is
        # an advisory, not a gate.
        from . import pipeline as pipeline_mod

        try:
            frag = (
                pipeline_mod.read_stripes(spark, out_dir, rid)
                .drop("data")
                .filter(F.col("status") == "completed")
                .groupBy("partition_id", "epoch", "stripe_idx")
                .agg(F.max("n_rows").alias("n"))
                .agg(
                    F.count(F.lit(1)).alias("groups"),
                    F.expr("percentile(n, 0.5)").alias("med"),
                )
                .first()
            )
        except Exception:  # stripes dir absent (ledger-only state)
            frag = None
        if frag and frag.groups and frag.groups >= 16 and (
            frag.med or 0
        ) < 4096:
            entry["fragmentation"] = {
                "stripe_groups": int(frag.groups),
                "median_rows": int(frag.med),
            }
            entry.setdefault("advice", []).append(
                f"fragmented layout: {int(frag.groups)} stripe groups "
                f"with median {int(frag.med)} rows — `compact` rewrites "
                "them at full stripe size (decode scans and metadata "
                "jobs shrink proportionally)"
            )
        from . import deletes as deletes_mod

        dstats = deletes_mod.delete_stats(spark, out_dir, rid)
        if dstats["n_vectors"] or dstats["n_eq_values"]:
            entry["live_deletes"] = dstats
            entry.setdefault("advice", []).append(
                f"live deletes ({dstats['rows_marked_ub']} position(s), "
                f"{dstats['n_eq_values']} equality value(s)): every "
                "decode pays the mask and metadata-only aggregates are "
                "refused — `compact` materializes the live view and "
                "clears them"
            )
        by_run[rid] = entry
    out = {"found": True, "runs": by_run}
    if storage_notes:
        out["storage_notes"] = storage_notes
    return out
