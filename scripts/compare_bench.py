#!/usr/bin/env python3
"""Apply the SURVEY §8.7 cpu_sec regression rule between bench rounds
(dev tool only; the engine itself is pure Scala/Spark).

Usage: compare_bench.py <baseline_detail.json ...> -- <candidate_detail.json ...>

Each file is a `graft.Bench` per-query detail dump
(SPARK_GRAFT_BENCH_DETAIL): {"queries": {name: {wall, task_sec,
cpu_sec}}, ...}. Baselines are the prior round's same-code runs (r13:
BENCH_DETAIL_r13_final_{a,b}.json); candidates are the new round's.

The rule (measured on the r13 four-run band — per-query same-code
cpu_sec max/min spread median 1.23 / p90 1.82):

- a query is FLAGGED only if its cpu_sec in EVERY candidate run
  exceeds SPREAD (default 1.8) × its baseline max — anything inside
  that band is indistinguishable from same-code measurement noise;
- the catalog check sums cpu_sec over the COMMON-query intersection
  on both sides (so catalog growth/shrink between rounds cannot read
  as a regression) and flags if the min candidate common total
  exceeds the max baseline common total by more than TOTAL_PCT
  (default 15%);
- queries present on only one side are LISTED, not silently skipped —
  a query that crashed out of the candidate round would otherwise be
  exactly the regression this tool stays quiet about;
- wall and task_sec common totals are printed for context only: wall
  swings ±22% on this shared host with identical code, and task run
  time absorbs host descheduling (r11: same-code median ratio 1.40 vs
  cpu's 1.09).

Exit code 1 if anything is flagged, else 0.
"""
import json
import sys

SPREAD = 1.8
TOTAL_PCT = 15.0
MIN_CPU_SEC = 0.05  # sub-50ms queries are pure noise at this harness


def load(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p, json.load(f)))
    return runs


def common_total(runs, names, metric, agg):
    """agg(per-run sum of `metric` over `names`) across runs."""
    return agg(sum(d["queries"][q][metric] for q in names) for _, d in runs)


def main(argv):
    if "--" not in argv:
        print(__doc__)
        return 2
    split = argv.index("--")
    base = load(argv[:split])
    cand = load(argv[split + 1:])
    if not base or not cand:
        print(__doc__)
        return 2

    bnames = set.intersection(*(set(d["queries"]) for _, d in base))
    cnames = set.intersection(*(set(d["queries"]) for _, d in cand))
    names = bnames & cnames
    flagged = []
    for q in sorted(names):
        bmax = max(d["queries"][q]["cpu_sec"] for _, d in base)
        cmin = min(d["queries"][q]["cpu_sec"] for _, d in cand)
        # sub-50ms on BOTH sides is pure harness noise; but a sub-50ms
        # baseline with a large candidate is exactly a regression, so
        # gate against max(bmax, MIN_CPU_SEC) instead of skipping
        if bmax < MIN_CPU_SEC and cmin < MIN_CPU_SEC:
            continue
        if cmin > SPREAD * max(bmax, MIN_CPU_SEC):
            flagged.append((q, bmax, cmin))

    btot = common_total(base, names, "cpu_sec", max)
    if not names or btot == 0:
        # disjoint catalogs (e.g. a rename) — the missing-query report IS
        # the diagnostic; a bare ZeroDivisionError would bury it
        print(f"no comparable queries: baseline runs {len(base)}, "
              f"candidate runs {len(cand)}, common {len(names)}, "
              f"baseline cpu total {btot}")
        for label, only in (("baseline-only", sorted(bnames - cnames)),
                            ("candidate-only", sorted(cnames - bnames))):
            if only:
                print(f"NOT COMPARED ({label}, {len(only)}): "
                      f"{', '.join(only)}")
        return 2
    ctot = common_total(cand, names, "cpu_sec", min)
    tot_reg = (ctot - btot) / btot * 100.0

    print(f"baseline runs: {len(base)}  candidate runs: {len(cand)}  "
          f"common queries: {len(names)}")
    for label, only in (("baseline-only", sorted(bnames - cnames)),
                        ("candidate-only", sorted(cnames - bnames))):
        if only:
            print(f"NOT COMPARED ({label}, {len(only)}): {', '.join(only)}")
    print(f"common-query cpu_sec total: baseline max {btot:.1f}  "
          f"candidate min {ctot:.1f}  delta {tot_reg:+.1f}% "
          f"(flag threshold +{TOTAL_PCT}%)")
    for metric in ("wall", "task_sec"):
        bm = common_total(base, names, metric, max)
        cm = common_total(cand, names, metric, min)
        print(f"  context {metric}: baseline max {bm:.1f}  "
              f"candidate min {cm:.1f} (not gated)")
    for q, bmax, cmin in flagged:
        print(f"FLAG {q}: cpu_sec {bmax:.2f} -> {cmin:.2f} "
              f"(> {SPREAD}x in every candidate run)")
    if not flagged:
        print("no per-query cpu_sec regressions beyond the same-code band")
    bad = bool(flagged) or tot_reg > TOTAL_PCT
    if tot_reg > TOTAL_PCT:
        print(f"FLAG common-query cpu_sec total regressed {tot_reg:+.1f}%")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
