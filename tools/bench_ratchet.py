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

Usage: python3 tools/bench_ratchet.py <reference.json> [current.json]
  reference.json — a prior round's bench_detail.json (or the BENCH_DETAIL
                   snapshot committed for that round)
  current.json   — defaults to ./bench_detail.json

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

RATCHET_X = 2.5
MIN_SEC = 0.5


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries_warm", d.get("queries", d))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    ref_path = sys.argv[1]
    cur_path = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"
    try:
        ref, cur = load(ref_path), load(cur_path)
    except (OSError, json.JSONDecodeError) as e:
        print(f"bench_ratchet: cannot load inputs: {e}")
        return 2
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
        if c < MIN_SEC:
            continue
        if c > RATCHET_X * r:
            (explained if q in waivers else bad).append((q, r, c))

    for q, r, c in explained:
        print(f"waived regression: {q} {r:.2f} -> {c:.2f} s "
              f"({c / r:.1f}x, ratchet-waiver in PLANS.md)")
    for q, r, c in bad:
        print(f"UNEXPLAINED regression: {q} {r:.2f} -> {c:.2f} s "
              f"({c / r:.1f}x > {RATCHET_X}x) — fix it or add "
              f"'ratchet-waiver: {q} — <reason>' to PLANS.md")
    n = len(set(ref) & set(cur))
    print(f"bench_ratchet: {n} compared, {len(bad)} unexplained, "
          f"{len(explained)} explained")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
