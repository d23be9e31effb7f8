#!/usr/bin/env python3
"""Compare two bench result JSONs (bench_result.json / BENCH_r*.json).

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [--bar 2.0]

Prints per-query ratios for the shared queries, sorted worst-first,
plus totals over the shared set and the queries unique to each side.
Exits non-zero if any shared query exceeds the ratio bar (default 2x)
— the same threshold the judge's BASELINE comparison uses, so a clean
exit here predicts a clean perf sheet.

Error rows ({"err": ...}, the Bench failure-isolation form) are listed
separately and also fail the run: a broken query must not pass a diff.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs, errs = {}, {}
    for k, v in d.get("queries", {}).items():
        if isinstance(v, dict):
            errs[k] = v.get("err", "?")
        else:
            qs[k] = float(v)
    return qs, errs


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bar = 2.0
    if "--bar" in sys.argv:
        bar = float(sys.argv[sys.argv.index("--bar") + 1])
    old_path, new_path = args[0], args[1]
    old, old_errs = load(old_path)
    new, new_errs = load(new_path)
    shared = sorted(set(old) & set(new))
    rows = []
    for q in shared:
        ratio = new[q] / old[q] if old[q] > 0 else float("inf")
        rows.append((ratio, q, old[q], new[q]))
    rows.sort(reverse=True)
    print(f"{'query':34} {'old_s':>8} {'new_s':>8} {'ratio':>7}")
    for ratio, q, o, n in rows:
        flag = "  <-- over bar" if ratio > bar else ""
        print(f"{q:34} {o:8.3f} {n:8.3f} {ratio:6.2f}x{flag}")
    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(f"\nshared {len(shared)} queries: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.2f}x)" if t_old else "no shared queries")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"only in {old_path}: {', '.join(only_old)}")
    if only_new:
        print(f"only in {new_path}: {', '.join(only_new)}")
    for name, errs in ((old_path, old_errs), (new_path, new_errs)):
        for q, e in sorted(errs.items()):
            print(f"ERROR in {name}: {q}: {e}")
    over = [q for ratio, q, _, _ in rows if ratio > bar]
    sys.exit(1 if over or old_errs or new_errs else 0)


if __name__ == "__main__":
    main()
