#!/usr/bin/env python3
"""Compare two bench_detail.json artifacts by calibration-normalized medians.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [ratio_threshold]

Prints per-query norm ratios (new/old) outside the threshold, plus the
calibration context, so a regression call doesn't eat the documented ~25%
host swing (SCALE.md). Queries present in only one artifact are listed
separately. Artifacts before r14 lack `norm`; for those the raw median is
normalized by that artifact's cal_start_sec when present, else used as-is
(flagged UNCAL).
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    cal = d.get("cal_start_sec")
    out = {}
    for name, q in d["queries"].items():
        if "norm" in q:
            out[name] = (q["norm"], False)
        elif cal:
            out[name] = (q["median"] / cal, False)
        else:
            out[name] = (q["median"], True)
    return d, out


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    do, old = load(old_path)
    dn, new = load(new_path)
    print(f"old: {do.get('value')} s / {do.get('n_queries')} q, "
          f"cal {do.get('cal_start_sec')}–{do.get('cal_end_sec')}")
    print(f"new: {dn.get('value')} s / {dn.get('n_queries')} q, "
          f"cal {dn.get('cal_start_sec')}–{dn.get('cal_end_sec')}")
    both = sorted(set(old) & set(new))
    moved = []
    for k in both:
        (a, ua), (b, ub) = old[k], new[k]
        if a <= 0:
            continue
        r = b / a
        if r >= thresh or r <= 1.0 / thresh:
            moved.append((r, k, a, b, ua or ub))
    moved.sort(reverse=True)
    if moved:
        print(f"\nnorm moved >= {thresh}x (new/old):")
        for r, k, a, b, uncal in moved:
            flag = "  UNCAL" if uncal else ""
            print(f"  {k:34s} {a:8.2f} -> {b:8.2f}  x{r:.2f}{flag}")
    else:
        print(f"\nno query moved >= {thresh}x calibration-normalized")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nremoved ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"\nadded ({len(only_new)}): {', '.join(only_new)}")


if __name__ == "__main__":
    main()
