#!/usr/bin/env python3
"""Summarize a scripts/variance_study.sh output directory: the noise band
of the bench instrument (mean/sd/CV of total_min across same-code runs),
per-iteration GC, and the top per-query variance contributors.

Usage: python3 scripts/variance_summary.py <dir with run*.json>
"""
import glob
import json
import statistics
import sys


def main(d: str) -> None:
    runs = []
    for f in sorted(glob.glob(f"{d}/run*.json")):
        lines = [ln for ln in open(f) if ln.strip()]
        full = json.loads(lines[0])
        summ = json.loads(lines[1]) if len(lines) > 1 else {}
        runs.append((f, full, summ))
    if len(runs) < 2:
        print("need >=2 runs")
        return
    mins = [r[1]["total_min"] for r in runs]
    colds = [r[1]["value"] for r in runs]
    gcs = [r[1].get("gc_ms_end", 0) - r[1].get("gc_ms_start", 0)
           for r in runs]
    mean, sd = statistics.mean(mins), statistics.stdev(mins)
    print(f"runs: {len(runs)}  heap_mb: {runs[0][1].get('max_heap_mb')}")
    for (f, full, summ) in runs:
        print(f"  {f.split('/')[-1]}: min {full['total_min']:.1f}s "
              f"cold {full['value']:.1f}s "
              f"gc {full.get('gc_ms_end',0)-full.get('gc_ms_start',0)}ms "
              f"load_start '{full.get('loadavg_start','')}' "
              f"gc_iter {summ.get('gc_ms_iter')}")
    print(f"total_min: mean {mean:.1f}s sd {sd:.1f}s "
          f"CV {100*sd/mean:.1f}%  band(±2sd) "
          f"[{mean-2*sd:.1f}, {mean+2*sd:.1f}]")
    print(f"total_cold: mean {statistics.mean(colds):.1f}s "
          f"sd {statistics.stdev(colds):.1f}s")
    print(f"gc_ms: mean {statistics.mean(gcs):.0f} "
          f"sd {statistics.stdev(gcs):.0f}")
    # per-query spread of min across runs — which queries carry the noise
    names = set(runs[0][1]["queries_min"])
    for (_, full, _) in runs[1:]:
        names &= set(full["queries_min"])
    spread = []
    for n in names:
        vals = [r[1]["queries_min"][n] for r in runs]
        spread.append((max(vals) - min(vals), n, min(vals), max(vals)))
    spread.sort(reverse=True)
    print("top-12 per-query min spread (max-min across runs):")
    for dd, n, lo, hi in spread[:12]:
        print(f"  {n}: {lo:.2f}..{hi:.2f} (+{dd:.2f}s)")
    tail = sum(dd for dd, *_ in spread[12:])
    print(f"  (remaining {len(spread)-12} queries spread sum {tail:.1f}s)")


if __name__ == "__main__":
    main(sys.argv[1])
