#!/usr/bin/env python3
"""Cold-pass smear-vs-culprit analysis over one Bench record.

Usage: python3 tools/cold_smear.py <bench.json>

Input is a Bench JSON line (BENCH_LOCAL.json or a driver BENCH_r{N}
whose `queries_cold` map survived) carrying per-query best-of-two
times (`queries`) and per-query FIRST-pass times (`queries_cold`).
Prints the pass-1 story so a cold_total_sec anomaly is localizable
without re-running anything:

  - cold excess = cold_total - best-of-two total
  - median per-query cold ratio (cold/warm) and the count above 2x
  - the ten biggest ABSOLUTE cold deltas and their share of the excess

Signature classifier (from the round-16 BASELINE addendum, where the
live co-load event reproduced the driver's r15 anomaly):

  CULPRIT — a few queries pay a lot: top-10 deltas >= 60% of the
    excess. Points at a plan/codegen/data problem in the named
    queries (localize and isolate them).
  SMEAR — every query pays a little: top-10 share < 50% (the excess
    is spread across the suite). That is box-level CPU contention
    and/or the whole-JVM JIT premium (~40 s measured for this suite)
    during pass 1 — not a plan regression; nothing to fix in any
    query. The median ratio says how hard the smear pressed.
  MIXED — share in [50%, 60%); read the table.

The deciding feature is the SHARE, not the median: both observed smear
events (driver r15 reproduced live in r16 under co-load, median 1.66x;
the calm driver r16 record, median 1.24x) spread their excess broadly
(top-10 = 35-37%), while a genuine culprit concentrates it.

Exit code is always 0 — this is a diagnosis, not a gate.
"""
import json
import sys


def main() -> int:
    rec = json.load(open(sys.argv[1]))
    warm = rec.get("queries") or {}
    cold = rec.get("queries_cold") or {}
    shared = sorted(set(warm) & set(cold))
    if not shared:
        print("no overlapping queries/queries_cold maps — pre-r16 record?")
        return 0
    ratios = sorted(cold[q] / max(warm[q], 1e-3) for q in shared)
    median_ratio = ratios[len(ratios) // 2]
    above2 = sum(1 for r in ratios if r > 2.0)
    deltas = sorted(((cold[q] - warm[q], q) for q in shared), reverse=True)
    excess = sum(d for d, _ in deltas)
    top10 = deltas[:10]
    top10_sum = sum(d for d, _ in top10)
    share = top10_sum / excess if excess > 0 else 0.0
    total = sum(warm[q] for q in shared)
    print(f"queries: {len(shared)}  warm total: {total:.1f} s  "
          f"cold excess: {excess:.1f} s")
    print(f"median cold ratio: {median_ratio:.2f}x  above 2x: "
          f"{above2}/{len(shared)}")
    print(f"top-10 absolute cold deltas ({top10_sum:.1f} s = "
          f"{share:.0%} of the excess):")
    for d, q in top10:
        print(f"  {q}: warm {warm[q]:.2f} s, cold {cold[q]:.2f} s "
              f"(+{d:.2f} s)")
    if share >= 0.6:
        sig = ("CULPRIT — a few queries carry the cold pass; isolate the "
               "named queries (fresh JVM, best-of-two) before reading "
               "anything else into this record")
    elif share < 0.5:
        sig = ("SMEAR — every query pays a little; contention and/or the "
               "whole-JVM JIT premium, not a plan regression")
    else:
        sig = "MIXED — no dominant signature; read the table"
    print(f"signature: {sig}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
