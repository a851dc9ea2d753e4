"""Bare-session contract check (VERDICT r02 directive #7).

The external correctness driver runs every query on a PLAIN 1 GB
``SparkSession.builder.getOrCreate()`` — none of session.py's confs.
Round 1 shipped queries that were green on the tuned test session and
red under the driver (events timestamp encoding, OOM at query ~90);
``registry._harness_safe`` closed those, and this test keeps the
contract from regressing: it shells out to the driver-mimic gate
(``tools/check_oracle.py --bare``) over a rotating ~20-query sample,
so a week of CI days covers the full registry while one run stays
under ~2 minutes. Set SPARK_GRAFT_SKIP_BARE=1 to skip locally when
iterating on something unrelated; full sweep:
``python tools/check_oracle.py --bare``.
"""

import datetime as dt
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"
STRIDE = 7  # ceil(139 / 20): one stride class per weekday-ish rotation


def rotating_sample() -> list[str]:
    sys.path.insert(0, REPO)
    from change_data_capture_spark import registry

    names = list(registry.queries())
    rot = dt.date.today().toordinal() % STRIDE
    return names[rot::STRIDE]


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_BARE") == "1",
    reason="bare-session gate skipped by SPARK_GRAFT_SKIP_BARE=1",
)
@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no sf0.01 fixtures")
def test_rotating_sample_is_green_on_a_plain_session():
    sample = rotating_sample()
    assert len(sample) >= 15
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         "--bare", SF_DIR, *sample],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"bare gate failed:\n{tail}\n{proc.stderr[-2000:]}"
