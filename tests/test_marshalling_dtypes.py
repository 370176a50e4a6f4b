"""Marshalling-stability gate: for every oracle-checked plan, the
pandas dtypes of the DuckDB result (``fetchdf()``) must equal the pandas
dtypes of the Spark result (``toPandas()``).

This catches the r1–r3 driver hash-fail class BEFORE the driver does:
two engines can hold mathematically identical values yet hash
differently after pandas marshalling — DuckDB renders HUGEINT (its
SUM(BIGINT) type) and >int64 decimals as float64 (``15000.0`` vs
Spark's ``15000``; ``1.71e+21`` vs an exact Decimal). The pinned rule
(DETERMINISM.md §"Output-type discipline") restricts final output
columns to types that marshal identically on both engines:
{BIGINT-within-int64, DOUBLE, STRING/VARCHAR, DATE, TIMESTAMP,
BOOLEAN, arrays thereof}. Integer aggregates in oracles are CAST to
BIGINT; >int64 digests are folded mod 2^61.
"""

from __future__ import annotations

import pytest

from comperhensive_bigdata_analysis__spark import plans

from .conftest import SF_SMOKE
from .oracle_harness import duck_con

#: pandas dtype pairs that are equivalent for hashing purposes even
#: though the spellings differ (none currently — keep empty so any new
#: asymmetry is a hard failure and must be fixed at the source).
_EQUIVALENT: set[tuple[str, str]] = set()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(plans.ORACLES))
def test_plan_dtypes_marshal_identically(spark, con, name):
    sdf = plans.QUERIES[name](spark, SF_SMOKE).toPandas()
    ddf = con.execute(plans.ORACLES[name]).fetchdf()
    s = {c: str(sdf[c].dtype) for c in sdf.columns}
    d = {c: str(ddf[c].dtype) for c in ddf.columns}
    assert set(s) == set(d), f"column sets differ: {sorted(s)} vs {sorted(d)}"
    bad = {
        c: (s[c], d[c])
        for c in s
        if s[c] != d[c] and (s[c], d[c]) not in _EQUIVALENT
    }
    assert not bad, (
        f"marshalling-fragile output columns in {name} (spark, duckdb): {bad} "
        "— cast the oracle aggregate (HUGEINT->BIGINT?) or fold >int64 "
        "values mod 2^61; see DETERMINISM.md output-type discipline"
    )
