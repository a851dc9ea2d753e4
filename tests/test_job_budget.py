"""Steal-immune structural perf gate (r9): every bench HEADLINE
query's Spark-action count must match the committed budget
(``tools/job_budget.json``). Wall-clock regressions on this host are
confounded by burst-credit steal; action-count growth is not — an
extra staging collect or a lost single-exchange plan shows up here
deterministically. After an INTENTIONAL plan change, regenerate with
``python tools/job_budget.py --update`` and commit the diff."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.job_budget import (
    BUDGET_FILE,
    headline_names,
    measure,
    measure_lifecycle,
    measure_streaming,
)


@pytest.mark.usefixtures("spark")
def test_headline_job_counts_match_budget(spark, sf_dir):
    assert os.path.exists(BUDGET_FILE), (
        "no committed budget — run `python tools/job_budget.py --update`"
    )
    with open(BUDGET_FILE) as f:
        budget = json.load(f)
    counts = measure(spark, sf_dir, headline_names())
    counts.update(measure_streaming(spark))
    counts.update(measure_lifecycle(spark))
    drift = {
        k: {"budget": budget.get(k), "measured": v}
        for k, v in counts.items()
        if budget.get(k) != v
    }
    assert not drift, (
        f"Spark-action counts drifted from tools/job_budget.json: {drift}. "
        "If the plan change is intentional, regenerate with "
        "`python tools/job_budget.py --update`."
    )
