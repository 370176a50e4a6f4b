"""Adjudicate the two newest COMMITTED bench artifacts (VERDICT r8 #4).

The >15% round-over-round flag rule (VERDICT r7 ask #5) was applied to
builder-local runs only, so the committed BENCH_r{N}.json pair — which
lands after the round's last commit and is the number of record — went
unannotated (r8: q5 +19%, q6 +24% on untouched plans, no verdict on
file). This tool closes that gap: run it at ROUND START, it diffs the
two newest committed BENCH_r*.json per-query medians and rewrites a
generated section at the top of BENCH_NOTES.md with the delta table
and a per-row verdict:

  ok        |delta| <= 15%
  band      >15% but within the correlated band of the run-wide median
            drift — a correlated host-state move, one environment
            datum, not a per-plan regression (the r7/r8 adjudication
            rule). The band half-width scales with the observed
            dispersion of deltas (2.5 * MAD, capped at the historical
            15pp so it only ever tightens — r9 ADVICE: a fixed 15pp
            auto-cleared real regressions on low-dispersion rounds),
            and a row moving AGAINST a >15% run-wide drift is never
            "correlated" regardless of distance.
  FLAG      >15% and OUTSIDE the correlated band — needs a written
            builder adjudication in the paragraph below the table

Since r11 the deltas are CALIBRATION-NORMALIZED when both artifacts
carry a stable env_END stamp (the r10 rule amendment, made usable):
each new median is divided by the ratio of the two artifacts'
post-workload calibration rows before the >15% trigger applies, so a
pure host-speed move normalizes away mechanically. The env_end stamp
is the normalizer because start-vs-end disagreement is structural JIT
state (see bench.py CAL_WARM comment); a stamp whose own MAD/median
exceeds CAL_MAD_MAX is declared unstable and the tool falls back to
raw deltas, saying so in the section header.

The section is idempotent per pair (re-running replaces it). Only the
committed artifacts are read — never a local rerun — so the verdicts
always refer to the driver's numbers of record.

Usage: python tools/bench_compare.py  (from anywhere; paths repo-rooted)
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SECTION_RE = re.compile(
    r"## Committed pair r\d+ vs r\d+ \(generated\).*?(?=\n## |\Z)", re.S
)
FLAG_PCT = 15.0  # |delta| above this needs a verdict
BAND_PP_CAP = 15.0  # historical band half-width; the MAD scale only tightens
BAND_PP_FLOOR = 4.0  # never narrower than bench noise on a 2-row sample
MAD_K = 2.5  # band half-width = MAD_K * MAD(deltas), clamped to the above


def _queries(path: str) -> dict[str, float]:
    art = json.load(open(path))
    inner = art.get("parsed")
    if not inner:
        tail = art.get("tail", "")
        i = tail.rfind('{"metric"')
        inner = json.loads(tail[i:]) if i >= 0 else {}
    out = dict(inner.get("queries", {}))
    _queries.last_env = {
        k: inner.get(k) for k in ("env_start", "env_end") if inner.get(k)
    }
    if not out:
        # a committed number-of-record artifact with zero parseable
        # queries is corruption, not "every query dropped" (r9 ADVICE)
        raise SystemExit(
            f"{os.path.basename(path)}: no queries parseable from 'parsed'"
            f" or the '{{\"metric\"' tail — corrupted artifact, refusing to"
            f" write a compare section"
        )
    return out


def newest_pair() -> tuple[str, str]:
    # numeric round sort, not lexicographic: BENCH_r100.json must sort
    # after BENCH_r99.json (r9 review)
    arts = sorted(
        (f for f in os.listdir(REPO) if re.fullmatch(r"BENCH_r\d+\.json", f)),
        key=lambda f: int(re.search(r"r(\d+)", f).group(1)),
    )
    if len(arts) < 2:
        raise SystemExit("need two committed BENCH_r*.json artifacts")
    return arts[-2], arts[-1]


#: The normalizer is the env_END calibration — post-workload, the one
#: JVM state two runs of the same bench share. Start-vs-end
#: disagreement is STRUCTURAL (measured r11: repeat-warmed plateau
#: ~75ms vs ~55ms after the bench's diverse task volume JITs the
#: scheduler paths), so the stability gate is the stamp's own
#: internal dispersion (MAD/median), not start==end agreement — the
#: r10 amendment's expectation that start and end should match was
#: the flaw that made the rule unusable.
CAL_MAD_MAX = 0.15  # env_end MAD/median above this = unstable stamp
#: A legacy stamp (pre-r11 bench.py, no calibration_mad_sec) carries no
#: internal-dispersion evidence, so its ratio is accepted only inside a
#: sane host-speed band — a single unvetted ~60ms count must never
#: rescale multi-second medians by an outlandish factor (r11 ADVICE).
CAL_RATIO_BAND = (0.7, 1.4)


def _calibration(env: dict) -> tuple[float | None, bool, str]:
    """(calibration seconds, MAD-vetted?, reason-if-unusable) for one
    artifact: the env_end post-workload calibration median, gated on
    its own MAD when the artifact records one (bench.py r11+). A stamp
    without a MAD (legacy artifact) is returned un-vetted — the caller
    must band-check the resulting ratio before trusting it."""
    e = env.get("env_end") or {}
    v = e.get("calibration_count_sec")
    if v is None or v <= 0:
        return None, False, "no env_end calibration stamp"
    mad = e.get("calibration_mad_sec")
    if mad is None:
        return v, False, ""
    if mad / v > CAL_MAD_MAX:
        return None, False, (
            f"unstable env_end calibration (MAD {mad}s / median {v}s "
            f"> {CAL_MAD_MAX})"
        )
    return v, True, ""


def _env_line(name: str, env: dict) -> str:
    parts = []
    for tag in ("env_start", "env_end"):
        e = env.get(tag)
        if e:
            parts.append(
                f"{tag.split('_')[1]} load {e.get('loadavg_1m')}, free"
                f" {e.get('mem_available_gb')} GiB, calib"
                f" {e.get('calibration_count_sec')}s"
            )
    return f"{name}: {'; '.join(parts)}." if parts else f"{name}: no stamp."


def build_section(old_name: str, new_name: str) -> str:
    old = _queries(os.path.join(REPO, old_name))
    env_old = dict(getattr(_queries, "last_env", {}))
    new = _queries(os.path.join(REPO, new_name))
    env_new = dict(getattr(_queries, "last_env", {}))
    common = sorted(set(old) & set(new), key=lambda q: (len(q), q))
    # Calibration normalization (the r10 rule amendment, made usable by
    # the r11 stamp fix): when BOTH artifacts carry a STABLE calibration
    # stamp, the new medians are divided by the calibration ratio before
    # the >15% trigger applies — an excursion that disappears under the
    # host-overhead normalizer is environment by definition. Either
    # stamp missing or internally unstable -> raw deltas, reason stated.
    cal_old, vetted_old, why_old = _calibration(env_old)
    cal_new, vetted_new, why_new = _calibration(env_new)
    normalized = bool(cal_old and cal_new)
    if normalized and not (vetted_old and vetted_new):
        # one or both stamps are legacy (no MAD): accept the ratio only
        # inside the sane host-speed band, else fall back to raw deltas
        ratio = cal_new / cal_old
        lo, hi = CAL_RATIO_BAND
        if not (lo <= ratio <= hi):
            normalized = False
            legacy = [
                n
                for n, vetted in ((old_name, vetted_old), (new_name, vetted_new))
                if not vetted
            ]
            band_fail = (
                f"cal ratio {ratio:.3f} outside [{lo}, {hi}] with "
                f"un-vetted legacy stamp(s) ({', '.join(legacy)} lack "
                f"calibration_mad_sec)"
            )
            # attribute the failure to the artifact(s) whose stamp is
            # actually un-vetted, not unconditionally to the old one
            # (r12 ADVICE #3)
            if not vetted_old:
                why_old = why_old or band_fail
            if not vetted_new:
                why_new = why_new or band_fail
    if normalized:
        cal_ratio = cal_new / cal_old
        vet_note = (
            "both stamps MAD-stable"
            if vetted_old and vetted_new
            else f"legacy stamp(s) without MAD accepted — ratio inside "
            f"the [{CAL_RATIO_BAND[0]}, {CAL_RATIO_BAND[1]}] sanity band"
        )
        cal_note = (
            f"Deltas are calibration-NORMALIZED ({vet_note}): "
            f"ratio {cal_ratio:.3f} ({cal_old:.4f}s -> {cal_new:.4f}s); "
            f"each r-new median is divided by it before the trigger."
        )
    else:
        cal_ratio = 1.0
        if why_old and why_old == why_new:
            # one shared failure (e.g. the band check when both stamps
            # are legacy) — the message already names the artifacts
            reasons = why_old
        else:
            reasons = "; ".join(
                f"{n}: {w}"
                for n, w in ((old_name, why_old), (new_name, why_new))
                if w
            )
        cal_note = f"Deltas are RAW — normalization unavailable ({reasons})."
    deltas = {
        q: (new[q] / cal_ratio - old[q]) / old[q] * 100
        for q in common
        if old[q]
    }
    med = statistics.median(deltas.values()) if deltas else 0.0
    mad = (
        statistics.median(abs(d - med) for d in deltas.values())
        if deltas
        else 0.0
    )
    band_pp = min(BAND_PP_CAP, max(BAND_PP_FLOOR, MAD_K * mad))
    ro = re.search(r"r(\d+)", old_name).group(1).lstrip("0")
    rn = re.search(r"r(\d+)", new_name).group(1).lstrip("0")
    lines = [
        f"## Committed pair r{ro} vs r{rn} (generated)",
        "",
        f"tools/bench_compare.py over the committed {old_name} /"
        f" {new_name} medians (the numbers of record). Run-wide median"
        f" drift {med:+.1f}%, delta MAD {mad:.1f}pp, correlated band"
        f" half-width {band_pp:.1f}pp (2.5*MAD clamped to [4, 15]) —"
        f" verdicts: ok (<=15%), band (correlated with the run-wide"
        f" drift; one environment datum), FLAG (needs the builder"
        f" adjudication below).",
        "",
        f"Host stamps (r9 ask #4 — present from BENCH_r10 on): "
        f"{_env_line(old_name, env_old)} {_env_line(new_name, env_new)}"
        f" {cal_note}",
        "",
        f"| query | r{ro} (s) | r{rn} (s) | "
        f"{'delta (calib-norm)' if normalized else 'delta'} | verdict |",
        "|---|---|---|---|---|",
    ]
    flags = []
    no_baseline = [q for q in common if q not in deltas]
    for q in common:
        d = deltas.get(q)
        if d is None:
            continue
        # a row moving against a >15% run-wide drift is never a
        # "correlated host move", whatever its distance from the median
        against_drift = abs(med) > FLAG_PCT and d * med < 0
        if abs(d) <= FLAG_PCT:
            verdict = "ok"
        elif abs(d - med) <= band_pp and not against_drift:
            verdict = "band"
        else:
            verdict = "**FLAG**"
            # triage hint (r13): a FLAG whose RAW delta is inside the
            # trigger is the stamp pricing a host-state move the plan
            # didn't share — 4 of the 5 r11-vs-r12 FLAGs were this
            # shape and all adjudicated to exoneration. Say so in the
            # table so the adjudicator starts from the likely verdict.
            raw_d = (new[q] - old[q]) / old[q] * 100
            if normalized and abs(raw_d) <= FLAG_PCT:
                verdict = f"**FLAG** (norm-only; raw {raw_d:+.1f}%)"
            flags.append(q)
        lines.append(
            f"| {q} | {old[q]:.3f} | {new[q]:.3f} | {d:+.1f}% | {verdict} |"
        )
    new_rows = sorted(set(new) - set(old))
    gone_rows = sorted(set(old) - set(new))
    if new_rows:
        lines.append(f"\nNew rows in r{rn} (no pair): {', '.join(new_rows)}.")
    if gone_rows:
        lines.append(f"\nRows dropped in r{rn}: {', '.join(gone_rows)}.")
    if no_baseline:
        # a 0.0 committed median is the most anomalous row there is —
        # surface it instead of silently skipping it (r9 review)
        lines.append(
            f"\nRows with a zero r{ro} median (no delta computable — "
            f"adjudicate the zero itself): {', '.join(no_baseline)}."
        )
    if flags:
        lines.append(
            f"\n**FLAGged rows ({', '.join(flags)}): builder adjudication"
            f" required — write the verdict in its own '## Adjudication"
            f" ...' section below (NOT inside this generated section:"
            f" a rerun replaces everything up to the next '## '"
            f" heading). Standing protocol (r11 verdict 'What's wrong"
            f" #2'): adjudicate by INTERLEAVED RATIO, not absolute idle"
            f" re-measurement — `python tools/adjudicate.py <query> ...`"
            f" strictly alternates the FLAGged plan with a stable anchor"
            f" (q7_exact_dedup) and reports plan/anchor ratios, which"
            f" cancel host state that contaminates both committed"
            f" absolutes in opposite directions.**"
        )
    else:
        lines.append("\nNo rows FLAGged outside the correlated band.")
    return "\n".join(lines) + "\n"


def main() -> None:
    old_name, new_name = newest_pair()
    section = build_section(old_name, new_name)
    notes_path = os.path.join(REPO, "BENCH_NOTES.md")
    text = open(notes_path).read()
    if SECTION_RE.search(text):
        text = SECTION_RE.sub(lambda _: section, text, count=1)
    else:
        # insert after the standing-file preamble (before the first ##)
        i = text.find("\n## ")
        text = text[: i + 1] + section + "\n" + text[i + 1 :]
    open(notes_path, "w").write(text)
    print(f"BENCH_NOTES.md: committed pair {old_name} vs {new_name} written")


if __name__ == "__main__":
    sys.exit(main())
