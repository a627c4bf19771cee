#!/usr/bin/env python3
"""Canary-normalized bench comparison (r18 verdict #6).

Compares two bench artifacts per gate, dividing each gate's time ratio by
the artifacts' canary ratio — the fixed-size synthetic join+agg canary
measures the host/session factor, so the normalized ratio isolates CODE
movement from machine movement. Gates whose normalized ratio exceeds the
measured back-to-back spread (~±10% on job-count-bound gates at this host
class, SCALING.md r18) are flagged; everything else is adjudicated
"host factor" arithmetic-style, without a judge re-run.

Usage: benchcmp.py <old.json> <new.json> [--spread 0.25] [--all]

Accepts both artifact shapes: the full bench_result.json
({"queries": {...}, "canary_sec": s}) and the driver's BENCH_r{N}.json
wrapper ({"parsed": {...}}; its "queries" holds only the slowest gates and
"canary" names the canary there). Exit code 1 when any gate regresses past
the spread, 0 otherwise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    queries = d.get("queries", {})
    canary = d.get("canary_sec", d.get("canary"))
    total = d.get("value")
    return queries, canary, total


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    spread = 0.25
    if "--spread" in sys.argv:
        spread = float(sys.argv[sys.argv.index("--spread") + 1])
    show_all = "--all" in sys.argv
    old_q, old_c, old_t = load(args[0])
    new_q, new_c, new_t = load(args[1])
    if not old_c or not new_c:
        print("WARN: missing canary in one artifact; "
              "falling back to raw ratios (host factor NOT removed)")
        host = 1.0
    else:
        host = new_c / old_c
    shared = sorted(set(old_q) & set(new_q))
    rows = []
    for g in shared:
        if old_q[g] <= 0:
            continue
        raw = new_q[g] / old_q[g]
        norm = raw / host
        rows.append((g, old_q[g], new_q[g], raw, norm))
    rows.sort(key=lambda r: -r[4])
    regressed = [r for r in rows if r[4] > 1 + spread]
    improved = [r for r in rows if r[4] < 1 - spread]
    meds = sorted(r[4] for r in rows)
    median = meds[len(meds) // 2] if meds else float("nan")
    print(f"gates compared: {len(rows)}   canary {old_c} -> {new_c} "
          f"(host factor {host:.3f})   totals {old_t:.1f} -> {new_t:.1f}s")
    print(f"median normalized ratio: {median:.3f}   spread gate: "
          f"±{spread:.0%}")
    hdr = f"{'gate':<34}{'old_s':>9}{'new_s':>9}{'raw':>8}{'norm':>8}"
    if regressed:
        print(f"\nREGRESSED past spread ({len(regressed)}):")
        print(hdr)
        for g, o, n, raw, norm in regressed:
            print(f"{g:<34}{o:>9.3f}{n:>9.3f}{raw:>8.2f}{norm:>8.2f}")
    if improved:
        print(f"\nimproved past spread ({len(improved)}):")
        print(hdr)
        for g, o, n, raw, norm in improved:
            print(f"{g:<34}{o:>9.3f}{n:>9.3f}{raw:>8.2f}{norm:>8.2f}")
    if show_all:
        print("\nall gates:")
        print(hdr)
        for g, o, n, raw, norm in rows:
            print(f"{g:<34}{o:>9.3f}{n:>9.3f}{raw:>8.2f}{norm:>8.2f}")
    if not regressed:
        print("\nverdict: no gate regressed past the normalized spread")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
