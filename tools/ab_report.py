#!/usr/bin/env python3
"""Report for tools/ab_cert.sh: per-gate min-of-N comparison of the two
interleaved arms, plus the measured within-arm band (the certification
claim: interleaving shrinks the adjudication band below the ±9% of
sequential whole-suite runs).

Usage: python3 tools/ab_report.py /tmp/ab_cert [ratio_flag_threshold=1.15]
"""
import glob
import json
import re
import statistics
import sys


def load(paths):
    runs = []
    for p in sorted(paths):
        m = re.search(r'"queries"\s*:\s*\{([^}]*)\}', open(p).read())
        runs.append({k: float(v) for k, v in
                     re.findall(r'"([^"]+)"\s*:\s*([0-9.eE+-]+)', m.group(1))})
    return runs


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_cert"
    flag = float(sys.argv[2]) if len(sys.argv) > 2 else 1.15
    a_runs = load(glob.glob(f"{out}/a_*.json"))
    b_runs = load(glob.glob(f"{out}/b_*.json"))
    common = sorted(set(a_runs[0]) & set(b_runs[0]))
    only_b = sorted(set(b_runs[0]) - set(a_runs[0]))

    def min_of(runs, q):
        return min(r[q] for r in runs if q in r)

    # within-arm band: per-gate (max-min)/min across an arm's repeats —
    # the spread interleaving leaves unexplained
    def band(runs):
        sp = [(max(r[q] for r in runs) - min_of(runs, q)) / min_of(runs, q)
              for q in runs[0] if all(q in r for r in runs)]
        return statistics.median(sp), max(sp)

    ratios = {q: min_of(b_runs, q) / min_of(a_runs, q) for q in common}
    med = statistics.median(ratios.values())
    a_med_band, a_max_band = band(a_runs)
    b_med_band, b_max_band = band(b_runs)
    print(f"arms: A={len(a_runs)} runs, B={len(b_runs)} runs, "
          f"{len(common)} common gates, {len(only_b)} new in B")
    print(f"within-arm band (median/max over gates): "
          f"A {a_med_band:.1%}/{a_max_band:.1%}  "
          f"B {b_med_band:.1%}/{b_max_band:.1%}")
    print(f"per-gate min-of-N ratio B/A: median {med:.3f}")
    ta = sum(min_of(a_runs, q) for q in common)
    tb = sum(min_of(b_runs, q) for q in common)
    print(f"common-gate totals: A {ta:.1f}s  B {tb:.1f}s  ({tb / ta:.3f}x)")
    # PAIRED statistics: run i of each arm shared a host window, so the
    # per-pair ratio B_i/A_i cancels window-level drift the within-arm
    # band cannot. The paired per-gate band across pairs is the honest
    # adjudication limit for a single gate; the paired suite totals show
    # what window drift does to whole runs even when interleaved.
    n_pairs = min(len(a_runs), len(b_runs))
    if n_pairs >= 2:
        paired_bands, paired_meds = [], []
        for q in common:
            rs = [b_runs[i][q] / a_runs[i][q] for i in range(n_pairs)
                  if q in a_runs[i] and q in b_runs[i]]
            if len(rs) >= 2:
                paired_bands.append((max(rs) - min(rs)) / min(rs))
                paired_meds.append(statistics.median(rs))
        # guard membership per pair: a partial run (crashed mid-suite)
        # that still parses must not KeyError the whole report
        pair_tots = [
            sum(b_runs[i][q] for q in qs) / sum(a_runs[i][q] for q in qs)
            for i in range(n_pairs)
            if (qs := [q for q in common
                       if q in a_runs[i] and q in b_runs[i]])]
        print(f"paired per-gate ratio: median {statistics.median(paired_meds):.3f}; "
              f"band across pairs: median "
              f"{statistics.median(paired_bands):.1%}, p90 "
              f"{sorted(paired_bands)[int(0.9 * len(paired_bands))]:.1%}")
        print("paired suite totals B/A:",
              " ".join(f"{t:.3f}" for t in pair_tots))
    movers = {q: r for q, r in ratios.items()
              if r > flag * med or r < med / flag}
    for q, r in sorted(movers.items(), key=lambda kv: -abs(kv[1] - med)):
        print(f"  mover {q}: {r:.2f}x  "
              f"(A {min_of(a_runs, q):.2f}s -> B {min_of(b_runs, q):.2f}s)")
    if only_b:
        print("new gates in B:", ", ".join(
            f"{q}={min_of(b_runs, q):.2f}s" for q in only_b))


if __name__ == "__main__":
    main()
