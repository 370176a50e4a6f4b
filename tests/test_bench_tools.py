"""Decision-logic tests for the bench adjudication tooling — the
protocol rules (bench_compare's calibration gate, adjudicate's verdict
table) are load-bearing for round-over-round performance claims, so
they are pinned as pure functions here. No Spark session needed."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    # tools insert REPO into sys.path on import; keep it idempotent
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


bench_compare = _load("bench_compare")
adjudicate = _load("adjudicate")


# --- bench_compare calibration gate (r11 ADVICE #1) -----------------


def test_calibration_stable_stamp_is_vetted():
    v, vetted, why = bench_compare._calibration(
        {"env_end": {"calibration_count_sec": 0.057, "calibration_mad_sec": 0.0018}}
    )
    assert v == 0.057 and vetted and not why


def test_calibration_legacy_stamp_returns_unvetted():
    """Pre-r11 artifact: value usable, but the caller must band-check
    the ratio before trusting it."""
    v, vetted, why = bench_compare._calibration(
        {"env_end": {"calibration_count_sec": 0.0619}}
    )
    assert v == 0.0619 and not vetted and not why


def test_calibration_unstable_mad_is_rejected():
    v, vetted, why = bench_compare._calibration(
        {"env_end": {"calibration_count_sec": 0.06, "calibration_mad_sec": 0.02}}
    )
    assert v is None and not vetted and "unstable" in why


def test_calibration_missing_stamp_is_rejected():
    v, vetted, why = bench_compare._calibration({})
    assert v is None and not vetted and "no env_end" in why


def test_committed_r10_r11_pair_normalizes_via_the_clamp_path():
    """The pair the feature was built for: r10 is a legacy stamp (no
    MAD) but the ratio 0.921 sits inside the sanity band, so the
    committed comparison stays NORMALIZED — with the vetting path
    stated — rather than silently trusting or silently dropping it."""
    section = bench_compare.build_section("BENCH_r10.json", "BENCH_r11.json")
    assert "calibration-NORMALIZED" in section
    assert "legacy stamp(s) without MAD accepted" in section
    assert "0.921" in section


# --- adjudicate verdict rule (r11 verdict 'What's wrong #2') ---------

OLD, NEW = "BENCH_rOLD.json", "BENCH_rNEW.json"


def _v(live_ratio, old_r, new_r, live_abs, old_abs):
    return adjudicate._verdict(
        live_ratio, [(OLD, old_r), (NEW, new_r)], live_abs, old_abs
    )


def test_verdict_matches_old_round_exonerates_environment():
    # q8's shape: live 2.12 vs committed 2.19 / 2.53
    v = _v(2.12, 2.19, 2.53, 0.62, 0.71)
    assert "exonerated" in v and OLD in v


def test_verdict_regression_needs_ratio_and_absolute_to_agree():
    # q24's shape: live ratio near the new round AND absolute above
    # the old committed +15% -> REAL
    v = _v(7.2, 5.71, 7.55, 2.49, 1.851)
    assert "REAL" in v


def test_verdict_anchor_drift_exonerates_on_absolutes():
    # q22's shape: ratio matches the new round but the live absolute
    # sits within tolerance of the old committed median
    v = _v(6.22, 5.05, 6.05, 1.794, 1.636)
    assert "anchor-drift" in v and "exonerated" in v


def test_verdict_indistinguishable_committed_ratios():
    v = _v(3.0, 2.9, 3.1, 1.0, 1.0)
    assert "never a per-plan signal" in v


def test_verdict_matches_neither():
    # q1@8x's shape: live between two far-apart committed ratios
    v = _v(3.04, 3.58, 2.42, 1.07, 1.16)
    assert "neither" in v


def test_verdict_missing_committed_ratio_is_not_a_match():
    v = _v(3.0, None, None, 1.0, None)
    assert "neither" in v


def test_verdict_no_old_absolute_is_insufficient_baseline():
    # the FLAGged row is absent from the old artifact: a ratio match to
    # the new round must NOT escalate to "REAL regression" when there
    # is no baseline absolute to corroborate it (r12 ADVICE #2), and
    # the message must not interpolate None
    v = _v(7.2, None, 7.55, 2.49, None)
    assert "insufficient" in v
    assert "REAL" not in v
    assert "None" not in v
