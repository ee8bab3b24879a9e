#!/usr/bin/env python3
"""Min-merge several `graft.Bench` artifacts (bench_out.json) from the
SAME corpus point into one committed comparable (BENCH_local_r*.json):
per query, keep the minimum over every run of every sweep — under
one-sided host noise the smallest observation is the closest to plan
cost (the same rule `tools/make_steady.py` applies for the in-jar
steady reference, and the bench itself applies across its re-times).

Usage:
  python3 tools/min_merge.py OUT.json sweep1.json [sweep2.json ...]

The LAST sweep's artifact is the scaffold (its wall/gc/meta fields are
kept, annotated with the sweep count); `queries`, per-query `sec`, and
the headline `value` are the min-merge. Driver-side tooling only.
"""
import json
import sys


def main(out, paths):
    best = {}
    best_detail = {}
    arts = []
    for p in paths:
        with open(p) as f:
            art = json.load(f)
        arts.append(art)
        for name, d in art["detail"].items():
            if not d.get("ok", False):
                continue
            runs = d.get("runs") or [d["sec"]]
            lo = min(runs)
            if name not in best or lo < best[name]:
                best[name] = lo
                best_detail[name] = d
    scaffold = arts[-1]
    # queries/detail reflect EXACTLY the min-merged set: a query absent
    # from the scaffold sweep is inserted from the sweep that produced
    # its min. A query that failed in EVERY sweep stays in `detail` with
    # ok:false (latest failure record wins) and is counted in n_failed —
    # excluded from the headline sum but never silently dropped, so an
    # all-failed query reads as a regression, not an improvement.
    all_failed = {}
    for art in arts:
        for name, d in art["detail"].items():
            if name not in best:
                all_failed[name] = d  # latest sweep's failure record wins
    scaffold["queries"] = dict(sorted(best.items()))
    for name in list(scaffold["detail"]):
        if name not in best and name not in all_failed:
            del scaffold["detail"][name]
    for name, sec in best.items():
        d = scaffold["detail"].setdefault(name, dict(best_detail[name]))
        d["sec"] = sec
    for name, d in all_failed.items():
        scaffold["detail"][name] = d
        print(f"WARNING: {name} failed in all {len(paths)} sweeps — "
              f"kept in detail with ok:false, excluded from headline",
              file=sys.stderr)
    scaffold["n_failed"] = len(all_failed)
    scaffold["value"] = sum(best.values())
    scaffold["min_merged_sweeps"] = len(paths)
    with open(out, "w") as f:
        json.dump(scaffold, f)
    print(f"wrote {out}: {scaffold['value']:.1f}s / {len(best)} queries "
          f"({scaffold['value'] / max(1, len(best)):.3f} s/q) "
          f"over {len(paths)} sweeps")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
