#!/usr/bin/env python3
"""Like-for-like comparison of two Bench records over their shared query
set (dev tool — the round-over-round reading the verdict computes).

Usage: python3 scripts/bench_compare.py <old.json> <new.json> [git:REV:PATH]
Either path may be git:REV:PATH to read a record out of history.
"""
import json
import statistics
import subprocess
import sys


def load(src: str) -> dict:
    if src.startswith("git:"):
        _, rev, path = src.split(":", 2)
        txt = subprocess.check_output(
            ["git", "-C", "/root/repo", "show", f"{rev}:{path}"]).decode()
    else:
        txt = open(src).read()
    return json.loads([ln for ln in txt.splitlines() if ln.strip()][0])


def main(old_src: str, new_src: str) -> None:
    old, new = load(old_src), load(new_src)
    om, nm = old["queries_min"], new["queries_min"]
    shared = sorted(set(om) & set(nm))
    osum = sum(om[q] for q in shared)
    nsum = sum(nm[q] for q in shared)
    ratios = sorted(((nm[q] / om[q]), q) for q in shared)
    print(f"shared {len(shared)} queries: {osum:.1f}s -> {nsum:.1f}s "
          f"= {nsum/osum:.3f}x")
    rvals = [r for r, _ in ratios]
    if len(rvals) >= 10:
        # statistics.quantiles(n=10): real deciles, not the approximate
        # index picks that silently degraded to min/max on small
        # SPARK_GRAFT_ONLY subsets
        qs = statistics.quantiles(rvals, n=10)
        p10, p90 = qs[0], qs[-1]
        print(f"ratio median {statistics.median(rvals):.3f} "
              f"p10 {p10:.3f} p90 {p90:.3f}")
    else:
        print(f"ratio median {statistics.median(rvals):.3f} "
              f"min {rvals[0]:.3f} max {rvals[-1]:.3f} "
              f"(n={len(rvals)} too small for deciles)")
    worst = sorted(((nm[q] - om[q]), q) for q in shared)
    print("largest absolute regressions:")
    for d, q in worst[-6:]:
        print(f"  {q}: {om[q]:.2f} -> {nm[q]:.2f} (+{d:.2f}s, "
              f"{nm[q]/om[q]:.2f}x)")
    print("largest absolute improvements:")
    for d, q in worst[:3]:
        print(f"  {q}: {om[q]:.2f} -> {nm[q]:.2f} ({d:+.2f}s)")
    only_new = sorted(set(nm) - set(om))
    if only_new:
        print(f"new queries ({len(only_new)}): " + ", ".join(
            f"{q}={nm[q]:.2f}s" for q in only_new))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
