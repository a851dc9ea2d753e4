"""Parallel test runner — cuts the full-suite wall clock from ~19 min
to a few minutes on local[32] (VERDICT r6 directive #5).

pytest-xdist is not available in this container, so this is the
hand-rolled equivalent: the test MODULES are duration-balanced into N
groups (greedy LPT against learned per-module timings; file size is
the cold-start proxy) and each group runs in its own pytest
subprocess with its own SparkSession sized to cores/N — total thread
count stays at the machine's 32, no oversubscription. Modules are the
split unit because the session fixture is session-scoped per process
and tests within a module may share tmp-path state; splitting finer
would re-pay the ~15 s SparkSession cold start per module.

Per-module wall times are harvested from each worker's junitxml and
written back to ``tools/partest_durations.json``, so the packing
improves after the first run. Exit code is nonzero if any worker
fails; each failing worker's tail is replayed to stdout.

Usage: python tools/partest.py [-n WORKERS] [pytest args passed through]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUR_FILE = os.path.join(REPO, "tools", "partest_durations.json")
TOTAL_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _modules() -> list[str]:
    return sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))


def _weights(mods: list[str]) -> dict[str, float]:
    learned: dict[str, float] = {}
    if os.path.exists(DUR_FILE):
        with open(DUR_FILE) as f:
            learned = json.load(f)
    out = {}
    for m in mods:
        key = os.path.basename(m)
        # cold-start proxy: ~1 s per KiB of test code is the right
        # order of magnitude for Spark-bound suites
        out[m] = float(learned.get(key, os.path.getsize(m) / 1024.0))
    return out


def _pack(mods: list[str], weights: dict[str, float], n: int) -> list[list[str]]:
    groups: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for m in sorted(mods, key=lambda m: -weights[m]):
        i = min(range(n), key=lambda i: groups[i][0])
        total, members = groups[i]
        groups[i] = (total + weights[m], members + [m])
    return [members for _, members in groups if members]


def _poll_walls(procs: list, t0: float, tick: float = 0.5) -> list[float]:
    """Wait for every subprocess, recording EACH worker's own wall
    clock at the moment it exits (index-aligned with ``procs``).
    Pure-ish and injectable: anything with ``poll()`` works, so the
    balance measurement is unit-testable without real subprocesses."""
    walls: list[float | None] = [None] * len(procs)
    while any(w is None for w in walls):
        for j, p in enumerate(procs):
            if walls[j] is None and p.poll() is not None:
                walls[j] = time.time() - t0
        if any(w is None for w in walls):
            time.sleep(tick)
    return walls  # type: ignore[return-value]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="worker processes")
    ap.add_argument("rest", nargs="*", help="extra pytest args")
    args = ap.parse_args()

    mods = _modules()
    weights = _weights(mods)
    groups = _pack(mods, weights, args.n)
    per_worker_cpus = max(2, TOTAL_CPUS // max(1, len(groups)))

    tmp = tempfile.mkdtemp(prefix="partest_")
    procs = []
    t0 = time.time()
    for i, group in enumerate(groups):
        xml = os.path.join(tmp, f"w{i}.xml")
        log = open(os.path.join(tmp, f"w{i}.log"), "w")
        env = dict(os.environ)
        # session.py derives both local[N] and the shuffle-partition
        # default from SPARK_GRAFT_CPUS, so one env var sizes the
        # whole worker
        env["SPARK_GRAFT_CPUS"] = str(per_worker_cpus)
        cmd = [
            sys.executable, "-m", "pytest", *group,
            "-q", "-p", "no:cacheprovider", f"--junitxml={xml}", *args.rest,
        ]
        procs.append(
            (i, group, xml, log,
             subprocess.Popen(cmd, cwd=REPO, env=env,
                              stdout=log, stderr=subprocess.STDOUT))
        )
        est = sum(weights[m] for m in group)
        print(f"worker {i}: {len(group)} modules, est {est:.0f}s "
              f"(local[{per_worker_cpus}])")

    failed = []
    durations: dict[str, float] = {}
    # Per-worker wall = each worker's OWN exit time (r10 advisory):
    # reaping sequentially with p.wait() timestamped the REAP, so
    # walls was non-decreasing and min(walls) was always worker 0's
    # finish — whenever worker 0 was not the fastest the printed
    # max/min balance collapsed toward 1.0 and could mask a real 2x
    # imbalance. Poll all workers and stamp each exit as it happens.
    walls_by_worker = _poll_walls([p for _, _, _, _, p in procs], t0)
    walls: list[float] = []
    for i, group, xml, log, p in procs:
        rc = p.returncode
        walls.append(walls_by_worker[i])
        log.close()
        if rc != 0:
            failed.append((i, log.name, rc))
        if os.path.exists(xml):
            try:
                for case in ET.parse(xml).getroot().iter("testcase"):
                    # classname is dotted ("tests.test_apply" or
                    # "tests.test_x.TestClass") — take the MODULE
                    # component. The old split(".")[0] collapsed every
                    # test into one "tests.py" key, so the learned
                    # durations never populated and packing silently
                    # ran on the file-size proxy forever (the r8
                    # 468-688 s worker imbalance).
                    parts = (case.get("classname") or "").split(".")
                    mod = next(
                        (p_ for p_ in parts if p_.startswith("test_")), None
                    )
                    if mod is None:
                        continue
                    durations[f"{mod}.py"] = durations.get(
                        f"{mod}.py", 0.0
                    ) + float(case.get("time", 0) or 0)
            except ET.ParseError:
                pass
        tail = open(log.name).read().strip().splitlines()
        print(
            f"worker {i} rc={rc} wall={walls[-1]:.0f}s: "
            f"{tail[-1] if tail else '(no output)'}"
        )

    if durations:
        learned = {}
        if os.path.exists(DUR_FILE):
            with open(DUR_FILE) as f:
                learned = json.load(f)
        learned.pop("tests.py", None)  # the pre-fix collapsed key
        learned.update({k: round(v, 2) for k, v in durations.items()})
        with open(DUR_FILE, "w") as f:
            json.dump(learned, f, indent=1, sort_keys=True)

    if len(walls) > 1 and min(walls) > 0:
        print(
            f"worker balance: max/min = {max(walls) / min(walls):.2f} "
            f"(target <= 1.2; re-run after a harvest if above)"
        )
    print(f"total wall: {time.time() - t0:.0f}s across {len(groups)} workers")
    for i, logname, rc in failed:
        print(f"\n===== worker {i} FAILED (rc={rc}), last 60 lines =====")
        print("\n".join(open(logname).read().splitlines()[-60:]))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
