"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real code lives in the ``comperhensive_bigdata_analysis__spark``
package; this module only adapts its plan registry to the driver's
calling convention.
"""

from __future__ import annotations

import glob as _glob
import json as _json
import pathlib as _pathlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from comperhensive_bigdata_analysis__spark import plans as _plans

#: The driver samples the FIRST 50 entries of ``queries()`` for its
#: correctness gate, so the head of the dict is a deliberate cross-
#: family window. Since round 7 the window is GENERATED, not
#: hand-rotated (VERDICT r6 ask #2): six relational flagships stay as
#: stable anchors, every oracled plan with no row in any committed
#: CORRECTNESS_r*.json artifact is packed in next (first-exposure
#: ratchet), and any remaining slots go to the plans whose most recent
#: driver evidence is OLDEST, so external verification keeps cycling
#: through the whole 180+-plan catalog instead of freezing on a
#: hand-picked list. Because the window recomputes from the artifacts
#: on disk, the rotation happens automatically the moment the driver
#: lands a new artifact — pytest stays green at every round boundary
#: (the r6 failure mode: a hard-coded window going stale the instant
#: CORRECTNESS_r06.json was written). Round 9 widened the eligible
#: pool to ALL registered plans so the four rows-only sketch plans
#: would collect external evidence — the r9 artifact settled what
#: that evidence is: for a plan absent from ``oracle_sql()`` the
#: driver records ``err: "no_oracle"`` with a bare spark_rows count
#: and **rows_match null** (NOT a rows-count comparison, as this
#: comment previously assumed — VERDICT r9 ask #5). Pool decision,
#: round 10: non-oracled plans are EXCLUDED from the window again —
#: a no_oracle row buys nothing a second time, and each raw sketch
#: plan now has an oracled tolerance-verdict twin (plans/sketch.py)
#: that turns its accuracy contract into a hash-matchable green row,
#: so the window slots go to plans where the driver can actually
#: verify something. The raw sketch plans stay in the catalog tail
#: (still returned by ``queries()``; local TOL_CHECKS tolerance
#: stamps cover them) — they just don't consume rotation slots.

_WINDOW_SIZE = 50

#: Stable relational flagships — always externally re-verified.
_ANCHORS = [
    "pricing_summary", "revenue_by_nation", "top_customers",
    "left_join_nation_region", "table_counts", "window_top_orders",
]


def _artifact_rounds(root: _pathlib.Path) -> dict[str, int]:
    """Map plan name -> index of the most recent committed driver
    artifact (CORRECTNESS_r*.json) containing a row for it. Plans
    absent from every artifact are first-exposure candidates."""
    # Numeric round sort, not lexicographic: CORRECTNESS_r100.json must
    # sort AFTER r99, or last-seen indices invert and the stale-first
    # rotation picks wrong plans (r9 ADVICE; same key as bench_compare).
    import re as _re

    def _round_key(path: str) -> int:
        m = _re.search(r"r(\d+)", _pathlib.Path(path).name)
        return int(m.group(1)) if m else -1

    last_seen: dict[str, int] = {}
    arts = sorted(_glob.glob(str(root / "CORRECTNESS_r*.json")), key=_round_key)
    for i, f in enumerate(arts):
        try:
            rows = _json.loads(_pathlib.Path(f).read_text())
        except (OSError, ValueError):  # unreadable artifact: skip, stay green
            continue
        if not isinstance(rows, dict):  # e.g. a top-level list — skip it
            continue
        for name in rows:
            last_seen[name] = i
    return last_seen


def _compute_window(
    size: int = _WINDOW_SIZE, root: _pathlib.Path | None = None
) -> list[str]:
    # Round-7 note: the round added 26 new oracled plans (TPC-H canon,
    # format matrix, DSIR), growing the never-driver-sampled pool to 57
    # — more than the 44 non-anchor slots. The alphabetical fresh-first
    # rule is deterministic, and the ~13 that spill re-enter
    # automatically next round because this window is recomputed from
    # the committed artifacts on disk, not a hand-rotated list.
    if root is None:
        root = _pathlib.Path(__file__).resolve().parent
    last_seen = _artifact_rounds(root)
    # Window-eligible = oracled plans only (round-10 pool decision, see
    # module comment): the driver records no comparison at all for
    # non-oracled plans, so a window slot on one is a wasted slot.
    eligible = set(_plans.QUERIES) & set(_plans.ORACLES)
    window = [n for n in _ANCHORS if n in eligible]
    fresh = sorted(
        n for n in eligible if n not in last_seen and n not in window
    )
    window += fresh[: size - len(window)]
    if len(window) < size:
        stale_first = sorted(
            (n for n in eligible if n not in window),
            key=lambda n: (last_seen.get(n, -1), n),
        )
        window += stale_first[: size - len(window)]
    return window[:size]


_DRIVER_WINDOW = _compute_window()


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _DRIVER_WINDOW if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary) on /root/testdata/sf0.001."""
    return _plans.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2)."""
    return _ordered(dict(_plans.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per plan (omitted => rows-only check)."""
    return _ordered(dict(_plans.ORACLES))
