#!/usr/bin/env python3
"""Scale-curve gate (driver-side tooling, not part of the Scala library):
compare two graft.Bench JSON lines taken at different scale factors and
flag queries whose wall-time ratio exceeds the data-growth factor by more
than the allowed headroom.

A ratio at or below `growth` means the query scales linearly or better
per row (fixed overheads amortize, so most healthy queries land well
under it). Sustained ratios above `growth * (1 + headroom)` mean the plan
does super-linear work per row — the 100 TB warning sign the gate exists
to catch.

Streaming queries (q35/q71/q72) pay a fixed checkpoint+sink I/O cost that
dominates at small SF, so their ratios are reported but exempt from the
gate by default.

Usage: python3 tools/scale_report.py <bench_small.json> <bench_large.json> \
         [--growth 10] [--headroom 0.5] [--exempt q35,q71,q72,q37]
"""
import argparse, json, sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("large")
    ap.add_argument("--growth", type=float, default=10.0,
                    help="data growth factor between the two runs")
    ap.add_argument("--headroom", type=float, default=0.5,
                    help="allowed fraction above linear before flagging")
    ap.add_argument("--exempt", default="q35,q71,q72,q37",
                    help="comma-separated substrings of fixed-cost queries")
    args = ap.parse_args()

    a = json.load(open(args.small))
    b = json.load(open(args.large))
    exempt = [e for e in args.exempt.split(",") if e]
    limit = args.growth * (1.0 + args.headroom)

    rows, flagged = [], []
    for k in sorted(a["queries"]):
        if k not in b["queries"]:
            continue
        t_small, t_large = a["queries"][k], b["queries"][k]
        ratio = t_large / t_small if t_small > 0 else float("inf")
        is_exempt = any(e in k for e in exempt)
        rows.append((k, t_small, t_large, ratio, is_exempt))
        if ratio > limit and not is_exempt:
            flagged.append(k)

    rows.sort(key=lambda r: -r[3])
    print(f"{'query':32s}{'small':>9s}{'large':>9s}{'ratio':>8s}")
    for k, ts, tl, r, ex in rows:
        mark = " EXEMPT" if ex else (" **FLAG**" if k in flagged else "")
        print(f"{k:32s}{ts:9.2f}{tl:9.2f}{r:8.1f}{mark}")
    n_ok = sum(1 for r in rows if not r[4])
    print(f"\ntotals: {a['value']:.1f}s -> {b['value']:.1f}s "
          f"({b['value']/a['value']:.1f}x for {args.growth:g}x data); "
          f"gate: ratio <= {limit:g} on {n_ok} non-exempt queries")
    if b.get("failed") and b["failed"] != []:
        print(f"FAILED at large SF: {b['failed']}")
        sys.exit(2)
    if flagged:
        print(f"SUPER-LINEAR: {flagged}")
        sys.exit(1)
    print("scale gate PASS")


if __name__ == "__main__":
    main()
