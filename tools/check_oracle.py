"""Driver-mimic correctness harness.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and
its ``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column-name set, and an order-insensitive value
canonicalization (columns sorted by name, every cell rendered to a
canonical string, rows sorted). Exact match required.

Usage: python tools/check_oracle.py [--lenient] [sf_dir] [query ...]

By default float cells render strictly (``repr``), so a DuckDB HUGEINT
that pandas materializes as ``123.0`` will NOT match a Spark bigint
``123`` — exactly like the driver's hash comparison. Fix the oracle SQL
(CAST ... AS BIGINT) rather than reaching for ``--lenient``, which
restores the old int-float parity and is strictly more forgiving than
the driver.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


LENIENT = False


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if LENIENT and v == int(v) and abs(v) < 1e15:
            return str(int(v))  # int-typed vs float-typed column parity
        return repr(v)
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_frame(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def _capture_stderr() -> str:
    """Route fd 2 (ours AND the child JVM's) through a file so the gate
    can scan for whole-stage-codegen compile failures afterwards. Spark
    logs `ERROR CodeGenerator: ... Failed to compile` and then silently
    falls back to interpreted execution — correct answers, hidden
    constant-factor loss (the r10 `ann_ivfpq` janino fallback sat
    undetected in 681 s of gate stderr). Returns the capture path."""
    import tempfile

    path = tempfile.mkstemp(prefix="check_oracle_stderr_")[1]
    f = open(path, "w")
    os.dup2(f.fileno(), 2)
    return path


def _codegen_failures(path: str) -> int:
    with open(path, errors="replace") as f:
        return f.read().count("Failed to compile")


def main() -> int:
    global LENIENT
    argv = sys.argv[1:]
    if "--lenient" in argv:
        LENIENT = True
        argv = [a for a in argv if a != "--lenient"]
    bare = "--bare" in argv
    argv = [a for a in argv if a != "--bare"]
    stderr_path = _capture_stderr()
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    only = set(argv[1:])

    import __spark_entry__ as entry_mod

    if bare:
        # Driver-mimic: a PLAIN session (none of session.py's confs),
        # exactly how the correctness harness runs the registry. Any
        # query green here is green under the driver.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("check-oracle-bare")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from change_data_capture_spark.session import get_spark

        spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [n for n in qs if not only or n in only]
    failures, t_all = [], time.time()
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows, cols={sorted(spdf.columns)} "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            continue
        scols, srows = canon_frame(spdf)
        ocols, orows = canon_frame(opdf)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
            _show_diff(srows, orows)
            continue
        if srows != orows:
            failures.append(name)
            print(f"FAIL {name}: values differ ({len(srows)} rows)")
            _show_diff(srows, orows)
            continue
        print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} ok in {time.time()-t_all:.0f}s")
    if failures:
        print("failing:", " ".join(failures))
    n_codegen = _codegen_failures(stderr_path)
    if n_codegen:
        # A codegen fallback is a PERF failure this gate refuses to
        # pass silently (VERDICT r10 directive #1): the query answers
        # correctly but runs a stage interpreted — rerun the named
        # queries one by one against this gate to isolate the plan.
        print(
            f"CODEGEN-FALLBACK: {n_codegen} 'Failed to compile' in "
            f"{stderr_path} — a stage ran interpreted; fix the "
            "expression width before trusting any timing"
        )
        return 1
    return 1 if failures else 0


def _show_diff(srows, orows, k: int = 3):
    s, o = set(srows), set(orows)
    for r in list(s - o)[:k]:
        print("   spark-only:", r)
    for r in list(o - s)[:k]:
        print("   oracle-only:", r)


if __name__ == "__main__":
    raise SystemExit(main())
