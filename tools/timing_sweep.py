"""Whole-registry wall-clock triage sweep (r11 optimization round).

Forces every registry query end-to-end with the noop sink at the given
scale factor and records wall seconds per query (min-of-N, default 1 —
this is a TRIAGE ranking, not the frozen bench protocol), plus any
whole-stage-codegen compile failures that Spark would otherwise swallow
silently (the r10 `ann_ivfpq` janino fallback was found only by reading
681 s of gate stderr by hand).

Usage: python tools/timing_sweep.py [sf_dir] [--runs N] [--out FILE]
       [query ...]

Output: JSON {"sf_dir": ..., "runs": N, "timings": {name: secs},
"errors": {name: msg}, "codegen_failures": [names]} — timings sorted
descending so the top of the file is the optimization worklist.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    runs, out_path = 1, None
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs = int(argv[i + 1]); i += 2
        elif argv[i] == "--out":
            out_path = argv[i + 1]; i += 2
        else:
            rest.append(argv[i]); i += 1
    sf_dir = rest[0] if rest else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    only = set(rest[1:])

    # Route the JVM's stderr through a log file we can scan for janino
    # codegen-compile failures (Spark logs ERROR CodeGenerator and then
    # silently falls back to interpreted execution).
    log_path = out_path + ".stderr" if out_path else "/tmp/timing_sweep.stderr"
    log_f = open(log_path, "w")
    os.dup2(log_f.fileno(), 2)

    from change_data_capture_spark import registry
    from change_data_capture_spark.session import get_spark

    spark = get_spark("timing-sweep")
    spark.sparkContext.setLogLevel("WARN")
    qs = {name: qd.fn for name, qd in registry.REGISTRY.items()}
    names = [n for n in qs if not only or n in only]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    fail_marks: dict[str, int] = {}

    def _codegen_failures() -> int:
        log_f.flush()
        with open(log_path) as f:
            return f.read().count("Failed to compile")

    n_fail = _codegen_failures()
    for name in names:
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        samples = []
        try:
            for _ in range(runs):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            timings[name] = round(min(samples), 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e).splitlines()[0][:200]
        new_fail = _codegen_failures()
        if new_fail > n_fail:
            fail_marks[name] = new_fail - n_fail
            n_fail = new_fail
        print(f"{name}: {timings.get(name, 'ERR')}"
              + (f"  [CODEGEN-FALLBACK x{fail_marks[name]}]" if name in fail_marks else ""))

    result = {
        "sf_dir": sf_dir,
        "runs": runs,
        "total": round(sum(timings.values()), 3),
        "timings": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
        "errors": errors,
        "codegen_failures": fail_marks,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("total", "codegen_failures", "errors")}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
