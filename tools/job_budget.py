"""Structural job-count budget — the steal-immune perf regression gate
(r9, VERDICT r8 directive #4).

The bench headline is wall-clock and the shared box has bursty host
CPU steal, so two rounds running the same code can differ 20% for
host reasons alone (BENCH_r07/r08 both carry ``steal_detected``).
The number of Spark ACTIONS a query triggers (captured with the same
``QueryExecutionListener`` as SCALE_AUDIT's jobs column) is a
structural property of the code path: data-size- and host-independent,
so growth here is a REAL regression (an extra staging collect, a lost
single-exchange plan) even when the wall clock is too noisy to show
it.

``tools/job_budget.json`` pins the per-query action count for the
bench HEADLINE queries at sf0.001; ``tests/test_job_budget.py`` fails
on any drift. Regenerate deliberately after an intentional plan
change:

    python tools/job_budget.py --update
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUDGET_FILE = os.path.join(REPO, "tools", "job_budget.json")


def measure(spark, sf_dir: str, names: list[str]) -> dict[str, int]:
    """Per-query Spark-action counts: build the query, force it with
    the noop sink (the bench's own forcing), and count every executed
    plan the run triggered — internal staging actions included."""
    from change_data_capture_spark import registry
    from change_data_capture_spark.planaudit import ExecutedPlanCollector

    out: dict[str, int] = {}
    with ExecutedPlanCollector(spark) as col:
        for name in names:
            col.drain()
            col.clear()
            df = registry.REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name] = len(col.drain())
    return out


def headline_names() -> list[str]:
    import bench

    return list(bench.HEADLINE)


def measure_streaming(spark) -> dict[str, int]:
    """Spark-action count of ONE streaming apply micro-batch — the
    metric the r8 ablation used to prove the streaming path had not
    regressed when the wall clock was steal-dominated (r8 code runs
    one fewer job per batch than r6). availableNow with no
    maxFilesPerTrigger processes the whole changelog as a single
    batch, so the count is exact and data-size-independent."""
    import tempfile

    from pyspark.sql import functions as F

    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.planaudit import ExecutedPlanCollector
    from change_data_capture_spark.streaming import (
        run_apply_stream,
        write_changelog,
    )

    root = tempfile.mkdtemp(prefix="job_budget_stream_")
    rows = spark.range(100).select(
        F.col("id").alias("c_custkey"), F.concat(F.lit("n"), "id").alias("c_name")
    )
    log = snapshot_changelog(
        rows, "perf.stream", ["c_custkey"], insert_version=F.col("c_custkey") + 1
    )
    write_changelog(log, os.path.join(root, "log"))
    with ExecutedPlanCollector(spark) as col:
        col.drain()
        col.clear()
        run_apply_stream(
            spark,
            os.path.join(root, "log"),
            TableCatalog(os.path.join(root, "cat")),
            os.path.join(root, "ckpt"),
        )
        n = len(col.drain())
    return {"streaming_apply_batch": n}


def measure_lifecycle(spark) -> dict[str, int]:
    """Spark-action counts of the rare-but-expensive LIFECYCLE ops
    (r10): erasure with proof, group export, fresh restore, and the
    resumed-restore re-verification. These paths gained machinery in
    r9/r10 (holds, checksums, locked re-checks) whose cost the bench
    headline never sees — pinning their action counts stops silent
    per-call action creep (an extra verification scan, a second
    metadata collect) the same way the headline pins do. Driver-created
    fixed-size inputs, so the counts are data-independent."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from change_data_capture_spark.apply import (
        TableCatalog,
        apply_changelog,
        forget_keys,
        import_group_snapshot,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.planaudit import ExecutedPlanCollector

    root = tempfile.mkdtemp(prefix="job_budget_lifecycle_")
    out: dict[str, int] = {}
    src = TableCatalog(os.path.join(root, "src"))
    rows = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), "id").alias("v")
    )
    apply_changelog(
        spark, snapshot_changelog(rows, "lc.t", ["k"], insert_version=3), src
    )
    # history so the erasure's vacuum has a version to retire
    apply_changelog(
        spark,
        dml_records(
            rows.filter("k = 0"), "lc.t", ["k"], op="UPDATE", version=4,
            value_overrides={"v": F.lit("v0b")},
        ),
        src,
    )
    with ExecutedPlanCollector(spark) as col:
        col.drain(); col.clear()
        src.export_group_snapshot(
            spark, ["lc.t"], watermark=4, dest_dir=os.path.join(root, "exp")
        )
        out["lifecycle_export_group"] = len(col.drain())
        col.clear()
        dst = TableCatalog(os.path.join(root, "dst"))
        import_group_snapshot(spark, os.path.join(root, "exp"), dst)
        out["lifecycle_import_fresh"] = len(col.drain())
        col.clear()
        # resumed path: existence + count/checksum re-verify, no write
        import_group_snapshot(spark, os.path.join(root, "exp"), dst)
        out["lifecycle_import_resumed"] = len(col.drain())
        col.clear()
        keys = spark.createDataFrame([(1,), (2,)], "k long")
        forget_keys(spark, src, "lc.t", keys, keep_last=1)
        out["lifecycle_forget_keys_keep1"] = len(col.drain())
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    from change_data_capture_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("job-budget")
    counts = measure(spark, sf_dir, headline_names())
    counts.update(measure_streaming(spark))
    counts.update(measure_lifecycle(spark))
    if "--update" in sys.argv:
        with open(BUDGET_FILE, "w") as f:
            json.dump(counts, f, indent=1, sort_keys=True)
        print(f"wrote {BUDGET_FILE}")
        for k, v in sorted(counts.items()):
            print(f"  {k}: {v}")
        return 0
    budget = {}
    if os.path.exists(BUDGET_FILE):
        with open(BUDGET_FILE) as f:
            budget = json.load(f)
    bad = {
        k: (budget.get(k), v)
        for k, v in counts.items()
        if budget.get(k) != v
    }
    for k, (want, got) in sorted(bad.items()):
        print(f"DRIFT {k}: budget {want} -> measured {got}")
    print(f"{len(counts) - len(bad)}/{len(counts)} within budget")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
