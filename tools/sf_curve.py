#!/usr/bin/env python3
"""SF-curve sweep: flag queries whose wall time grows superlinearly
between two Bench runs at different scale factors.

Usage: python3 tools/sf_curve.py <bench_small.json> <bench_big.json> [flag_ratio]

flag_ratio defaults to 5 for 10x data (tightened from 10 in round 16,
r15 verdict item 2, after the last all-pairs exact-truth fixtures were
converted to fixed-budget md5 panels — there are NO exempt queries
anymore; the heaviest honest ratios isolate at 3.0-3.8x, so 5x is a
real bug signal, not an upper band). Exit 1 if anything is flagged.

This is the gate that caught q_pq_planted (117 s at sf1: exact ADC
|Q|x|N| with the panel a corpus share), the modulo-stride IVF
centroids (assign N x N/25), and SemDeDup's fixed k (within-cell
N^2/8) in round 15 — fixture parameters that ride the corpus size are
invisible at the oracle SFs and quadratic at scale. NOTE: totals swing
+-25% with box state; a 5-6x reading from group runs should be
re-measured ISOLATED (fresh JVM, best-of-two) before being treated as
real — the r16 borderline set (q_bpe_docs, q_salted_join,
q_range_join, q_dup_span_strip) read 4.6-5.4x in-sweep and
2.4-3.8x isolated.
"""
import json
import sys


def main() -> int:
    small_path, big_path = sys.argv[1], sys.argv[2]
    sf_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
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
        # Floor: a query under 0.3 s at the small SF is fixed-cost
        # dominated there, so its raw ratio measures JVM/plan overhead,
        # not the data term. A true quadratic still flags overwhelmingly
        # (0.1 s -> 10 s reads 33x against the floor).
        ratio = t_big / max(t_small, 0.3)
        # Blind-spot closure (r16 ADVICE): the floor alone lets a
        # genuinely superlinear query whose big-SF reading is still
        # under floor*sf_ratio pass silently (0.02 s -> 1.2 s = 60x raw
        # reads 4x against the floor). Also flag on the RAW ratio when
        # it is extreme (> 3x the threshold), floor notwithstanding —
        # sub-floor denominators are noisy, so only a 3x-threshold raw
        # reading is treated as signal rather than jitter.
        raw = t_big / max(t_small, 1e-3)
        if ratio > sf_ratio or raw > 3 * sf_ratio:
            flagged.append((max(ratio, raw), q, t_small, t_big))
    for ratio, q, a, b in sorted(flagged, reverse=True):
        print(f"FLAG {q}: {a:.3f}s -> {b:.3f}s = {ratio:.1f}x "
              f"for {sf_ratio:.0f}x data (superlinear)")
    if not (flagged or only_small or only_big):
        print(f"sf-curve clean: no query above {sf_ratio:.0f}x "
              f"across {len(big)} queries")
    return 1 if (flagged or only_small or only_big) else 0


if __name__ == "__main__":
    sys.exit(main())
