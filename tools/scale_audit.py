"""Whole-registry physical-plan scale audit.

Builds every registry query at a small scale factor and inspects its
EXECUTED plan for the shapes that do not survive a 100 TB /
1000-executor scale-up — the same properties tests/test_plans.py pins
for ~30 hand-picked queries, swept across the entire surface:

- ``CartesianProduct``: genuinely all-pairs work — HARD flag unless
  the query is a documented brute-force BASELINE (the oracles'
  quadratic twins).
- ``BroadcastNestedLoopJoin``: reported but NOT a failure — Spark
  only picks it when one side is broadcast-small, and in this repo
  every occurrence is a scalar-aggregate or bounded-metadata side
  (corpus totals, avgdl, centroid/codebook tables, date bounds) that
  stays scalar at any corpus size; the dangerous specific queries
  have explicit guards in tests/test_plans.py instead.
- ``BatchEvalPython`` / ``ArrowEvalPython``: row-at-a-time Python in a
  relational plan. Allowed only for the multimodal codec-boundary
  operators, which are deliberately Arrow-batched ``mapInPandas``.
- Exchange count: printed for eyeballing shuffle-heavy plans (not a
  failure — aggregations and joins legitimately shuffle).

Usage: python tools/scale_audit.py [sf_dir] [--out SCALE_AUDIT.md]
Exit code 1 if any query outside the allowlists trips a flag, so the
audit can run as a gate.
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Documented-intentional all-pairs plans: the quadratic correctness
# baselines (each exists to validate a scalable path) and the ANN
# brute-force top-k whose BROADCAST side is the handful of query
# vectors, not the corpus.
ALLPAIRS_OK = re.compile(
    r"^(dedup_ngram_jaccard|dedup_embedding_cosine|ann_topk_bruteforce"
    r"|embedding_knn_label_eval|dedup_embedding_clusters"
    r"|rag_hybrid_retrieval|cdc_rag_serving|embedding_decontaminate"
    r"|q_corr_quantity_price)$"
)
# Arrow-batched mapInPandas at the codec boundary is the DESIGN for
# binary payloads (never row-at-a-time Python UDFs).
PYTHON_OK = re.compile(r"^multimodal_")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            out_path = sys.argv[i + 1]

    from change_data_capture_spark import registry
    from change_data_capture_spark.session import get_spark

    spark = get_spark("scale-audit")
    rows = []
    failures = []
    for name, qd in registry.REGISTRY.items():
        t0 = time.time()
        try:
            plan = (
                qd.fn(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as e:  # noqa: BLE001 - audit must cover all
            failures.append((name, f"build error: {e}"))
            continue
        cartesian = "CartesianProduct" in plan
        bnlj = "BroadcastNestedLoopJoin" in plan
        allpairs = cartesian
        python = ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan)
        exchanges = plan.count("Exchange ")
        flags = []
        if allpairs and not ALLPAIRS_OK.match(name):
            flags.append("all-pairs")
        if python and not PYTHON_OK.match(name):
            flags.append("python-eval")
        rows.append((name, cartesian, bnlj, python, exchanges, flags, time.time() - t0))
        if flags:
            failures.append((name, "+".join(flags)))
        spark.catalog.clearCache()

    flagged = [r for r in rows if r[5]]
    lines = [
        "# SCALE_AUDIT — whole-registry physical-plan sweep",
        "",
        f"sf_dir: `{sf_dir}` — {len(rows)} queries audited, "
        f"{len(flagged)} flagged, {len(failures) - len(flagged)} build errors.",
        "",
        "Allowlisted by design: quadratic oracle baselines (cartesian), "
        "multimodal codec-boundary mapInPandas (python-eval). "
        "bnlj = BroadcastNestedLoopJoin with a scalar/bounded broadcast side "
        "(informational, scale-safe).",
        "",
        "| query | cartesian | bnlj | python | exchanges | flags |",
        "|---|---|---|---|---|---|",
    ]
    for name, ca, bn, py, ex, flags, _t in sorted(rows, key=lambda r: (-len(r[5]), r[0])):
        lines.append(
            f"| {name} | {'Y' if ca else ''} | {'Y' if bn else ''} "
            f"| {'Y' if py else ''} | {ex} | {', '.join(flags)} |"
        )
    report = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(report)
        print(f"wrote {out_path}")
    print(
        f"audited {len(rows)} queries: {len(flagged)} flagged, "
        f"{sum(1 for _, ca, *_ in rows if ca)} cartesian (allowlisted), "
        f"{sum(1 for _, _, bn, *_ in rows if bn)} scalar-side bnlj (info), "
        f"{sum(1 for _, _, _, py, *_ in rows if py)} python-eval (allowlisted)"
    )
    for name, why in failures:
        print(f"FLAG {name}: {why}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
