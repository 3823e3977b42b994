#!/usr/bin/env python3
"""SF-curve sweep: flag queries whose wall time grows superlinearly
between two Bench runs at different scale factors.

Usage: python3 tools/sf_curve.py <bench_small.json> <bench_big.json> [sf_ratio]

sf_ratio defaults to 10 (sf0.1 -> sf1). A query is flagged when its
wall-time ratio exceeds sf_ratio (linear would be <= sf_ratio; in
practice well under it, since per-query fixed cost dominates the
small-SF reading). Exit 1 if anything is flagged.

This is the gate that caught q_pq_planted (117 s at sf1: exact ADC
|Q|x|N| with the panel a corpus share), the modulo-stride IVF
centroids (assign N x N/25), and SemDeDup's fixed k (within-cell
N^2/8) in round 15 — fixture parameters that ride the corpus size are
invisible at the oracle SFs and quadratic at scale. Known exact-truth
paths (all-pairs recall oracles) sit at 5-8x for 10x data here; a
true quadratic reads >= sf_ratio.
"""
import json
import sys


def main() -> int:
    small_path, big_path = sys.argv[1], sys.argv[2]
    sf_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    flagged = []
    # A query missing from EITHER side is as suspicious as a superlinear
    # one (it crashed or was dropped from that run) — report both
    # directions and fail the sweep on any set mismatch.
    only_small = sorted(set(small) - set(big))
    only_big = sorted(set(big) - set(small))
    for q in only_small:
        print(f"FLAG {q}: present only in {small_path} (missing from big run)")
    for q in only_big:
        print(f"FLAG {q}: present only in {big_path} (missing from small run)")
    for q, t_big in sorted(big.items()):
        t_small = small.get(q)
        if t_small is None:
            continue
        ratio = t_big / max(t_small, 0.05)  # floor: fixed-cost noise
        if ratio > sf_ratio:
            flagged.append((ratio, q, t_small, t_big))
    for ratio, q, a, b in sorted(flagged, reverse=True):
        print(f"FLAG {q}: {a:.3f}s -> {b:.3f}s = {ratio:.1f}x "
              f"for {sf_ratio:.0f}x data (superlinear)")
    if not (flagged or only_small or only_big):
        print(f"sf-curve clean: no query above {sf_ratio:.0f}x "
              f"across {len(big)} queries")
    return 1 if (flagged or only_small or only_big) else 0


if __name__ == "__main__":
    sys.exit(main())
