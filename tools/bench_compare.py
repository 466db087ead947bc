#!/usr/bin/env python3
"""Cross-round bench comparison on BOTH series (VERDICT r17 #7).

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json>
       [--ratio-floor 1.5] [--abs-floor 1.0]

Reads the count-based series (`queries`) AND the forced series
(`queries_forced`) from two bench artifacts and prints, for each
series: common-key totals + ratio, the regression set (> ratio-floor
AND > abs-floor seconds), and the improvement set — so a
projection-pruned narrow-map regression (invisible to count timings;
the storm_enrich 0.25s lesson) surfaces in the same report as the
headline. Calibration stamps of both runs are echoed first: read them
before attributing any mover to code.

Tooling only — NOT part of the library.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def compare(tag, old, new, ratio_floor, abs_floor):
    common = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    print(f"\n== {tag} series: {len(common)} common keys "
          f"{t_old:.1f}s -> {t_new:.1f}s (ratio {t_new / t_old:.3f}x)")
    regs = [(new[k] / old[k], k) for k in common
            if new[k] > old[k] * ratio_floor and new[k] - old[k] > abs_floor]
    imps = [(old[k] / new[k], k) for k in common
            if old[k] > new[k] * ratio_floor and old[k] - new[k] > abs_floor]
    for label, rows in (("regressions", sorted(regs, reverse=True)),
                        ("improvements", sorted(imps, reverse=True))):
        print(f"   {label}: " + (", ".join(
            f"{k} {old[k]:.2f}->{new[k]:.2f}s ({r:.2f}x)" for r, k in rows)
            if rows else "none"))
    only_new = sorted(set(new) - set(old))
    if only_new:
        t = sum(new[k] for k in only_new)
        print(f"   new keys ({len(only_new)}, {t:.1f}s): "
              + ", ".join(f"{k} {new[k]:.1f}s" for k in only_new
                          if new[k] >= 1.0))


def main(old_path, new_path, ratio_floor=1.5, abs_floor=1.0):
    old, new = load(old_path), load(new_path)
    for name, d in (("old", old), ("new", new)):
        print(f"{name}: total={d.get('value', 0):.1f}s "
              f"forced={d.get('value_forced', 0):.1f}s "
              f"n={d.get('n_queries')} failed={d.get('n_failed')} "
              f"calib={d.get('calib_iters_per_ms_start')}->"
              f"{d.get('calib_iters_per_ms_end')} "
              f"clean={d.get('clean_machine')}")
    compare("count", old.get("queries", {}), new.get("queries", {}),
            ratio_floor, abs_floor)
    compare("forced", old.get("queries_forced", {}),
            new.get("queries_forced", {}), ratio_floor, abs_floor)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a.split("=")[0][2:]: float(a.split("=")[1])
             for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    main(args[0], args[1], flags.get("ratio-floor", 1.5),
         flags.get("abs-floor", 1.0))
