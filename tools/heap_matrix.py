#!/usr/bin/env python3
"""Compare HEAPCHECK acceptance-matrix bench runs: min-of-2 per query
per heap, flag >1.5x breaches between heaps, for both series.

Usage: python3 tools/heap_matrix.py <8g_run1.json> <8g_run2.json> \
           <90g_run1.json> <90g_run2.json>
Tooling only — NOT part of the library.
"""
import json, sys

def load(path):
    d = json.load(open(path))
    return d

def min2(a, b, key):
    qa, qb = a.get(key, {}), b.get(key, {})
    return {q: min(qa[q], qb[q]) for q in qa if q in qb}

def main(p8a, p8b, p90a, p90b):
    a8, b8, a90, b90 = load(p8a), load(p8b), load(p90a), load(p90b)
    for f in (a8, b8, a90, b90):
        print(f"calib mt start/end: {f['calib_mt_iters_per_ms_start']}/"
              f"{f['calib_mt_iters_per_ms_end']}  n_failed={f['n_failed']}")
    for series, key in (("count", "queries"), ("forced", "queries_forced")):
        s8 = min2(a8, b8, key)
        s90 = min2(a90, b90, key)
        total8, total90 = sum(s8.values()), sum(s90.values())
        breaches = []
        for q in sorted(s8):
            if q not in s90:
                continue
            lo, hi = s8[q], s90[q]
            ratio = hi / lo if lo > 0 else 0
            if ratio > 1.5 and hi - lo > 0.5:
                breaches.append((q, lo, hi, ratio))
        print(f"\n== {series}: 8g min2 total {total8:.1f}s, "
              f"90g min2 total {total90:.1f}s")
        if breaches:
            for q, lo, hi, r in sorted(breaches, key=lambda x: -x[3]):
                print(f"  BREACH {q}: {lo:.2f}s @8g -> {hi:.2f}s @90g ({r:.2f}x)")
        else:
            print("  no >1.5x breaches")

if __name__ == "__main__":
    main(*sys.argv[1:5])
