"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sum of per-query wall secs>,
   "unit": "sec", "queries": {name: secs, ...}, "sf": <sf>, ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect) and timed THREE times after warmup, reporting the
min per query: on a shared machine the local[32] scheduler adds
multi-second noise spikes (observed: identical code, back-to-back
runs, one query 0.84 s then 4.35 s), and min-of-N is the standard
steady-state filter for that — every run does the full work, nothing
is cached between them beyond the OS page cache all already share
with the warmup pass. N=3 (was 2 through round 2) because round-3
measurements showed min-of-2 still letting whole-run noise bursts
through.

PROTOCOL-CHANGE DISCLOSURE (round 3): two changes make the round-3
headline not directly comparable to BENCH_r01/r02 — (a) min-of-3 is
mechanically <= min-of-2 on identical code; (b) the mutation-shaped
CDC queries now measure the merge against a pre-seeded base table
(registry._seeded_customer_catalog) instead of re-timing the snapshot
apply inside the operator. The round-3 engine wins were therefore
verified under the OLD protocol first: on min-of-2 runs before the
switch, cdc_apply_mutations measured 1.60s/1.35s (r02: 2.36),
text_langid 0.62s/0.51s (r02: 0.99), ann_topk_bruteforce 0.53s/0.38s
(r02: 0.64) — real engine deltas, not measurement artifacts. A
streaming-throughput figure mirroring the reference's perf test
(N insert change events through source -> normalize -> apply;
records/second, CDCPipelinePerfTest.java:195-199) is reported
alongside.

ROUND-4 CHANGE (then FROZEN): the streaming leg is now also min-of-3
(fresh catalog + checkpoint per run; the changelog is written once).
Round 3's single-run streaming figure could not distinguish the
apparent 15% rec/s regression from one scheduler noise burst — this
closes that hole. The round-4 protocol (min-of-3 queries, min-of-3
streaming, pre-seeded mutation bases) is the frozen baseline for all
future rounds; `--ledger` appends each run to PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from change_data_capture_spark import registry
from change_data_capture_spark.apply import TableCatalog
from change_data_capture_spark.changelog import snapshot_changelog
from change_data_capture_spark.session import get_spark
from change_data_capture_spark.streaming import run_apply_stream, write_changelog

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_top_orders_per_customer",
    "q_events_hourly",
    "q_user_sessions",
    "cdc_apply_snapshot",
    "cdc_apply_mutations",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "multimodal_image_meta",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def streaming_throughput(
    spark, sf_dir: str, n_records: int = 5000, runs: int = 3
) -> tuple[float, float]:
    """Reference perf-test shape: N insert change events streamed
    through dedup + apply; returns (elapsed_sec, records_per_sec) of
    the BEST of ``runs`` full executions — the same min-of-N
    steady-state filter as the query legs (round-3 protocol note: the
    single-run figure could not distinguish a real regression from a
    scheduler noise burst on a shared 32-core box). The changelog is
    written once; each run streams it into a FRESH catalog + checkpoint
    (full work every time, nothing resumes)."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).limit(n_records)
    root = tempfile.mkdtemp(prefix="bench_stream_")
    log = snapshot_changelog(cust, "perf.stream", ["c_custkey"], insert_version=F.col("c_custkey") + 1)
    write_changelog(log, os.path.join(root, "log"))
    samples: list[float] = []
    n = None
    for i in range(runs):
        cat = TableCatalog(os.path.join(root, f"cat{i}"))
        t0 = time.time()
        run_apply_stream(spark, os.path.join(root, "log"), cat, os.path.join(root, f"ckpt{i}"))
        samples.append(time.time() - t0)
        if n is None:
            n = cat.read(spark, "perf.stream").count()
    best = min(samples)
    streaming_throughput.last_spread = round(max(samples) - best, 3)
    return best, n / best


def _warmup(spark, sf_dir: str, qs) -> None:
    """Steady-state methodology: run every headline plan once at the
    smallest scale factor first. Whole-stage codegen compiles and JITs
    per plan shape (1-3 s apiece) and the generated-class cache keys on
    expression structure, so the tiny-SF pass pre-compiles exactly the
    classes the timed pass reuses. At the 100 TB design point that
    one-time compile cost is noise; timing it at sf0.1 would swamp the
    actual per-row work the benchmark is trying to observe."""
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    for name in HEADLINE:
        try:
            _force(qs[name](spark, warm_dir))
        except Exception:
            pass  # timed run will surface real failures


def _host_snapshot() -> dict:
    """Host-contention counters for the steal detector: 1-minute
    loadavg plus the cumulative steal/total jiffies from /proc/stat.
    Read twice (before/after the timed section) so the artifact can
    report how much CPU the HOST stole from this VM during the run —
    the shared box has bursty burst-credit throttling (PERF.md ledger
    note) that min-of-N cannot always filter; two consecutive driver
    artifacts were noise-dominated (VERDICT r7 directive #4)."""
    snap = {"load1": None, "steal": None, "total": None}
    try:
        snap["load1"] = float(open("/proc/loadavg").read().split()[0])
        cpu = open("/proc/stat").readline().split()[1:]
        vals = [int(x) for x in cpu]
        snap["total"] = sum(vals)
        snap["steal"] = vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        pass
    return snap


def _steal_verdict(before: dict, after: dict) -> dict:
    """steal_pct = host-stolen share of all jiffies during the run;
    the artifact is flagged untrustworthy (steal_detected) when the
    host stole >2% of the run's CPU time or the 1-minute load exceeds
    the core count (another tenant of the shared box)."""
    out = {"load1_before": before.get("load1"), "load1_after": after.get("load1")}
    if None not in (before.get("steal"), after.get("steal"), before.get("total"), after.get("total")):
        dt = after["total"] - before["total"]
        ds = after["steal"] - before["steal"]
        out["steal_pct"] = round(100.0 * ds / dt, 2) if dt > 0 else 0.0
    ncpu = os.cpu_count() or 32
    load_hot = max(
        x for x in (before.get("load1"), after.get("load1"), 0.0) if x is not None
    ) > ncpu
    out["steal_detected"] = bool(out.get("steal_pct", 0.0) > 2.0 or load_hot)
    return out


def run_bench(spark, sf_dir: str) -> dict:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # RAW builders, not registry.queries(): the queries() wrapper
    # (_harness_safe) clears caches and re-sets confs per call — the
    # right guard for an untuned correctness harness, but it would
    # change this benchmark's methodology mid-series (rounds are
    # compared on identical min-of-2 semantics over a tuned session).
    qs = {name: qd.fn for name, qd in registry.REGISTRY.items()}
    _warmup(spark, sf_dir, qs)

    # min-of-3 stays the headline statistic (frozen protocol); the
    # max-min SPREAD of the same 3 samples is recorded alongside so
    # regression triage can tell a plan change from a shared-box noise
    # burst without re-litigating (VERDICT r6 directive #8: four
    # queries swung +13..+33% in the r6 driver artifact purely from
    # box load). Spread is REPORTING ONLY — it changes no timed work
    # and no headline semantics.
    host_before = _host_snapshot()
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(3):
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            samples.append(time.time() - t0)
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) - min(samples), 3)

    streaming_throughput(spark, sf_dir, n_records=100, runs=1)  # plan/state warmup
    stream_sec, stream_rps = streaming_throughput(spark, sf_dir)
    timings["streaming_apply_5k"] = round(stream_sec, 3)
    spreads["streaming_apply_5k"] = streaming_throughput.last_spread

    total = round(sum(timings.values()), 3)
    host = _steal_verdict(host_before, _host_snapshot())
    n_codegen = 0
    if _STDERR_CAPTURE[0]:
        try:
            with open(_STDERR_CAPTURE[0], errors="replace") as f:
                n_codegen = f.read().count("Failed to compile")
        except OSError:
            n_codegen = -1
    result = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "streaming_records_per_sec": round(stream_rps, 1),
        "spreads": spreads,
        "host": host,
        "steal_detected": host["steal_detected"],
        # cumulative count for the process — a nonzero value means some
        # stage in this run (warmup included) ran interpreted
        "codegen_failures": n_codegen,
    }
    return result


def _precheck_steal(window_s: float = 8.0) -> dict:
    before = _host_snapshot()
    time.sleep(window_s)
    return _steal_verdict(before, _host_snapshot())


def anchor(spark, sf_dir: str, budget_min: float = 45.0) -> int:
    """Quiet-band absolute anchor (r9, VERDICT r8 directive #4): both
    the r7 and r8 driver artifacts were steal-flagged, so the newest
    trustworthy absolute headline was r6-era. This mode runs the bench
    ONLY when an 8 s /proc/stat pre-check reads steal < 1% and the
    load is cool, re-checks the flag on the finished artifact, and
    keeps the FIRST clean run as a PERF.md ledger row (marked ANCHOR).
    Flagged attempts are discarded (printed for the record, never
    ledgered); retries back off until the time budget runs out."""
    deadline = time.time() + budget_min * 60.0
    attempt = 0
    while True:
        attempt += 1
        pre = _precheck_steal()
        quiet = (
            not pre.get("steal_detected")
            and pre.get("steal_pct", 99.0) < 1.0
        )
        if quiet:
            result = run_bench(spark, sf_dir)
            result["anchor_attempt"] = attempt
            print(json.dumps(result))
            if not result["steal_detected"] and (
                result["host"].get("steal_pct", 99.0) < 1.0
            ):
                _append_ledger(result, anchor=True)
                print(f"ANCHOR kept on attempt {attempt} "
                      f"(steal {result['host'].get('steal_pct')}%)")
                return 0
            print(f"attempt {attempt}: flagged mid-run "
                  f"(steal {result['host'].get('steal_pct')}%), discarding")
        else:
            print(f"attempt {attempt}: pre-check hot "
                  f"(steal {pre.get('steal_pct')}%, "
                  f"load {pre.get('load1_after')}), waiting")
        if time.time() > deadline:
            print("anchor budget exhausted — no quiet-band run; the "
                  "structural job-count gate (tools/job_budget.py) "
                  "carries the perf story until the host calms down")
            return 1
        time.sleep(30.0)


def _capture_stderr() -> str:
    """Route fd 2 (ours and the JVM's) through a file so the artifact
    can report whole-stage-codegen compile failures (r11, VERDICT r10
    directive #1): Spark logs `ERROR CodeGenerator: ... Failed to
    compile` and silently falls back to interpreted execution — a
    constant-factor perf loss the wall clock alone cannot attribute.
    The timed work is unchanged; only where stderr lands moves."""
    fd, path = tempfile.mkstemp(prefix="bench_stderr_")
    os.close(fd)
    f = open(path, "w")
    os.dup2(f.fileno(), 2)
    _STDERR_CAPTURE[0] = path
    return path


_STDERR_CAPTURE: list[str | None] = [None]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    stderr_path = _capture_stderr()
    spark = get_spark("cdc-spark-bench")
    if "--anchor" in sys.argv:
        budget = 45.0
        for i, a in enumerate(sys.argv):
            if a == "--budget-min" and i + 1 < len(sys.argv):
                budget = float(sys.argv[i + 1])
        rc = anchor(spark, sf_dir, budget)
        spark.stop()
        raise SystemExit(rc)
    result = run_bench(spark, sf_dir)
    print(json.dumps(result))
    if "--ledger" in sys.argv:
        _append_ledger(result)
    spark.stop()


def _append_ledger(result: dict, anchor: bool = False) -> None:
    """Append this run to PERF.md — the round-over-round perf ledger
    (one row per query per run, protocol column) so protocol changes
    and regressions are caught by diff, not archaeology."""
    import datetime

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PERF.md")
    protocol = "min3-q/min3-s"  # frozen as of round 4
    if anchor:
        # quiet-band absolute anchor: pre-checked AND post-checked
        # steal < 1% — the row future rounds compare against
        protocol += " ANCHOR"
    if result.get("steal_detected"):
        # the row itself says it ran under host contention (steal_pct
        # from /proc/stat around the timed section) — treat its
        # numbers as upper bounds, not regressions
        protocol += f" STEAL {result['host'].get('steal_pct', '?')}%"
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M")
    new_file = not os.path.exists(path)
    with open(path, "a") as f:
        if new_file:
            f.write(
                "# PERF ledger\n\nAppended by `python bench.py --ledger`. "
                "Protocol `min3-q/min3-s` = min-of-3 query legs, min-of-3 "
                "streaming leg (frozen round 4; rounds 1-2 were min-of-2 "
                "queries + single-run streaming, round 3 min-of-3 queries + "
                "single-run streaming — see bench.py docstring).\n\n"
                "| when (UTC) | protocol | sf | headline | stream rec/s | "
                + " | ".join(HEADLINE + ["streaming_apply_5k"])
                + " |\n|"
                + "---|" * (5 + len(HEADLINE) + 1)
                + "\n"
            )
        q = result["queries"]
        sp = result.get("spreads", {})

        def cell(n: str) -> str:
            # "min (+spread)": the min is the ledger statistic (frozen
            # protocol); the parenthesized max-min of the same 3
            # samples marks how noisy the box was during THIS run —
            # a regressed min with a small spread is a plan change, a
            # regressed min inside a wide spread is load
            v = q.get(n, "")
            return f"{v} (+{sp[n]})" if n in sp and v != "" else str(v)

        f.write(
            f"| {stamp} | {protocol} | {result['sf']} | {result['value']} | "
            f"{result['streaming_records_per_sec']} | "
            + " | ".join(cell(n) for n in HEADLINE + ["streaming_apply_5k"])
            + " |\n"
        )


if __name__ == "__main__":
    main()
