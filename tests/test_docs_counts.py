"""Docs can't drift from the registry (VERDICT r1 #8): the plan counts
written in README.md and SCALE_AUDIT.md must equal len(plans.QUERIES),
and every oracle-less plan must be a documented rows-only exception.
"""

from __future__ import annotations

import os
import re

from comperhensive_bigdata_analysis__spark import plans

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(_REPO, "README.md")
SCALE_AUDIT = os.path.join(_REPO, "SCALE_AUDIT.md")

#: Plans intentionally registered WITHOUT a DuckDB oracle (sketch /
#: approximate results get rows-only + tolerance tests instead):
#: approx_distinct_users, approx_percentile_prices,
#: hll_mergeable_distinct, approx_percentile_calibration.
ROWS_ONLY_OK = 4


def test_readme_plan_count_matches_registry():
    m = re.search(r"(\d+) named plans", open(README).read())
    assert m, "README.md no longer states the catalog size"
    assert int(m.group(1)) == len(plans.QUERIES)


def test_scale_audit_totals_match_registry():
    m = re.search(r"Catalog totals: (\d+) plans", open(SCALE_AUDIT).read())
    assert m, "SCALE_AUDIT.md missing its totals line (rerun tools/scale_audit.py)"
    assert int(m.group(1)) == len(plans.QUERIES)


def test_oracle_coverage_is_total_minus_documented_exceptions():
    assert len(plans.ORACLES) == len(plans.QUERIES) - ROWS_ONLY_OK
    missing = set(plans.QUERIES) - set(plans.ORACLES)
    assert len(missing) == ROWS_ONLY_OK, sorted(missing)
