#!/usr/bin/env python3
"""Per-query bench ratchet (VERDICT r15 #6): compare the current
bench_detail.json per-query warm series against a prior-round reference
and fail on unexplained regressions.

A >RATCHET_X regression on any query fails the gate unless PLANS.md
contains an EXPLICIT waiver line for it:

    ratchet-waiver: <query_name> — <one-line reason>

A plain mention of the query name does NOT count (PLANS.md is the
planning doc — most queries are named somewhere in it, so a substring
match would auto-suppress ~65% of the fleet and make the gate
vacuous; round-16 review finding). Waivers are exact-name matches on
the marker, so q_jaccard_join_ab cannot waive q_jaccard_join.

Usage: python3 tools/bench_ratchet.py <reference.json> [current.json ...]
  reference.json — a prior round's bench_detail.json (or the BENCH_DETAIL
                   snapshot committed for that round)
  current.json   — defaults to ./bench_detail.json. SEVERAL current
                   captures may be given: a query then fails the gate
                   only when it regresses in EVERY capture (r21: single
                   fleet captures flag ~3 random sub-2s queries near the
                   normalized gate — q_stratified read 14.5x in one
                   capture and 1.0x in the next on untouched code;
                   replication separates noise from regressions)

Exit 0 = clean (or every regression explained), 1 = unexplained
regressions, 2 = usage/IO error.

Queries present only on one side are reported informationally and never
fail the gate (new queries have no ratchet; removed queries have no
current number). Sub-threshold absolute times are ignored: a 0.05 s ->
0.20 s swing is scheduler noise, not a regression — MIN_SEC filters the
comparison to queries whose current warm time is at least that large.
"""
import json
import os
import re
import sys

RATCHET_X = 2.5          # raw-ratio gate (no control factors available)
RATCHET_X_NORM = 1.5     # drift-normalized gate (VERDICT r20 #2): when both
                         # artifacts stamp control_factor, per-query ratios
                         # are divided by the factor ratio, which removes box
                         # drift — so the gate can be much tighter than the
                         # raw 2.5x that had to tolerate drift
MIN_SEC = 0.5


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries_warm", d.get("queries", d)), d.get("control_factor")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    ref_path = sys.argv[1]
    cur_paths = sys.argv[2:] if len(sys.argv) > 2 else ["bench_detail.json"]
    try:
        ref, ref_cf = load(ref_path)
        curs = [load(p) for p in cur_paths]
    except (OSError, json.JSONDecodeError) as e:
        print(f"bench_ratchet: cannot load inputs: {e}")
        return 2
    cur, cur_cf = curs[0]
    # drift normalization: with control factors on both sides, divide each
    # per-query ratio by the box-drift ratio and gate at RATCHET_X_NORM.
    # Normalization is all-or-nothing (ADVICE r21): when ANY capture lacks
    # a factor the gate falls back to raw 2.5x, and dividing the captures
    # that do have one would double-count drift tolerance — so raw ratios
    # are used for EVERY capture in that mode.
    drifts = [(c_cf / ref_cf) if (ref_cf and c_cf and ref_cf > 0
                                  and c_cf > 0) else None
              for _, c_cf in curs]
    normalize = all(drifts)
    if not normalize:
        drifts = [None] * len(curs)
    gate = RATCHET_X_NORM if normalize else RATCHET_X
    if normalize:
        print(f"drift-normalized gate: control_factor {ref_cf} -> "
              f"{[c for _, c in curs]} (drift {[f'{d:.2f}' for d in drifts]}),"
              f" per-query gate {gate}x normalized, "
              f"{len(curs)} capture(s) — a regression must replicate in all")
    else:
        print(f"raw gate {gate}x (control_factor missing on one side)")
    waivers = set()
    plans_path = os.path.join(os.path.dirname(ref_path) or ".", "PLANS.md")
    if os.path.exists("PLANS.md"):
        plans_path = "PLANS.md"
    if os.path.exists(plans_path):
        with open(plans_path) as f:
            for line in f:
                m = re.match(r"\s*ratchet-waiver:\s*(\S+)", line)
                if m:
                    waivers.add(m.group(1))

    only_ref = sorted(set(ref) - set(cur))
    only_cur = sorted(set(cur) - set(ref))
    if only_ref:
        print(f"info: {len(only_ref)} queries only in reference "
              f"(no current number): {', '.join(only_ref[:8])}"
              + (" ..." if len(only_ref) > 8 else ""))
    if only_cur:
        print(f"info: {len(only_cur)} new queries (no ratchet): "
              f"{', '.join(only_cur[:8])}"
              + (" ..." if len(only_cur) > 8 else ""))

    bad, explained = [], []
    for q in sorted(set(ref) & set(cur)):
        r, c = ref[q], cur[q]
        if r <= 0 or c < 0:  # failed shots recorded as -1
            continue
        # MIN_SEC gates on the MAX current time across captures (ADVICE
        # r21): a query fast in capture 1 but slow-and-regressed in every
        # other would otherwise be silently skipped
        times = [cw[q] for cw, _ in curs if q in cw and cw[q] >= 0]
        if not times or max(times) < MIN_SEC:
            continue
        # the gate only trips when the regression replicates in every
        # capture (min ratio over captures); the REPORTED time is the one
        # from the capture that produced that gating ratio, so the printed
        # seconds and the ratio beside them agree (ADVICE r21)
        pairs = [((cw[q] / r) / (d or 1.0), cw[q])
                 for (cw, _), d in zip(curs, drifts)
                 if q in cw and cw[q] >= 0]
        if not pairs:
            continue
        ratio, c_at_min = min(pairs)
        if ratio > gate:
            (explained if q in waivers else bad).append((q, r, c_at_min, ratio))

    for q, r, c, ratio in explained:
        print(f"waived regression: {q} {r:.2f} -> {c:.2f} s "
              f"({ratio:.1f}x normalized, ratchet-waiver in PLANS.md)")
    for q, r, c, ratio in bad:
        print(f"UNEXPLAINED regression: {q} {r:.2f} -> {c:.2f} s "
              f"({ratio:.1f}x normalized > {gate}x) — fix it or add "
              f"'ratchet-waiver: {q} — <reason>' to PLANS.md")
    n = len(set(ref) & set(cur))
    print(f"bench_ratchet: {n} compared, {len(bad)} unexplained, "
          f"{len(explained)} explained")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
