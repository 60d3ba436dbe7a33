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
    detect_windows(runs)


def detect_windows(runs, ratio=1.5, min_excess=0.5):
    """Locate contention windows IN TIME from the per-query start-offset
    stamps (queries_t0_*, r18 bench): >=2 consecutive-in-time queries of
    one iteration running at >=ratio x the best-of-runs min with at least
    min_excess seconds of excess each. A window with FLAT GC is external
    contention; one with proportional GC is heap pressure. Replaces the
    r17 diagnosis-by-alphabetical-adjacency.
    """
    base = {}
    for _, full, _ in runs:
        for q, v in full.get("queries_min", {}).items():
            base[q] = min(base.get(q, v), v)
    iters = [("queries", "queries_gc_cold", "queries_t0_cold"),
             ("queries_warm", "queries_gc_warm", "queries_t0_warm"),
             ("queries_warm2", "queries_gc_warm2", "queries_t0_warm2")]
    found = False
    stamped = False
    print(f"contention windows (>=2 consecutive queries at >={ratio}x "
          f"best-of-runs, >= {min_excess}s excess each):")
    for f, full, _ in runs:
        for it, (tk, gk, ok) in enumerate(iters):
            t0m = full.get(ok)
            if not t0m:
                continue
            stamped = True
            times, gcs_ = full.get(tk, {}), full.get(gk, {})
            cur, wins = [], []
            for q, off in sorted(t0m.items(), key=lambda kv: kv[1]):
                t, b = times.get(q), base.get(q)
                infl = (t is not None and b is not None and t < 1e8
                        and t >= ratio * b and (t - b) >= min_excess)
                if infl:
                    cur.append((q, off, t, b, gcs_.get(q, 0)))
                else:
                    if len(cur) >= 2:
                        wins.append(cur)
                    cur = []
            if len(cur) >= 2:
                wins.append(cur)
            for w in wins:
                found = True
                start, end = w[0][1], w[-1][1] + w[-1][2]
                excess = sum(t - b for _, _, t, b, _ in w)
                gc = sum(g for *_, g in w)
                print(f"  {f.split('/')[-1]} iter{it}: "
                      f"t+{start:.0f}s..t+{end:.0f}s ({len(w)} queries, "
                      f"+{excess:.1f}s excess, gc {gc:.0f}ms): "
                      + ", ".join(q for q, *_ in w))
    if not stamped:
        print("  (records carry no queries_t0_* stamps — pre-r18 bench)")
    elif not found:
        print("  none detected")


if __name__ == "__main__":
    main(sys.argv[1])
