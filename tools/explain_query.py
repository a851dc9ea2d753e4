"""Print the optimized + formatted physical plan of any registry query.

Usage: python tools/explain_query.py <query_name> [sf_dir] [--extended]

The plan-iteration loop this repo's CLAUDE.md mandates ("explain, then
iterate until it's the plan you'd want") in one command: shows
PushedFilters / ReadSchema (pruning), WholeStageCodegen spans, join
strategies, and exchanges for the named query at the given scale.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    extended = "--extended" in sys.argv
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from change_data_capture_spark import registry
    from change_data_capture_spark.session import get_spark

    qs = registry.queries()
    if name not in qs:
        import difflib

        close = difflib.get_close_matches(name, qs, n=5)
        print(f"unknown query {name!r}; close: {close}")
        return 2
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[name](spark, sf_dir)
    df.explain("extended" if extended else "formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
