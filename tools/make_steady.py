#!/usr/bin/env python3
"""Regenerate the committed per-query steady-state reference that
`graft.Bench` embeds in its artifact and uses as its re-time trigger.

Usage:
  python3 tools/make_steady.py <sfName> [--floor steady.txt ...] \
      bench_out1.json [bench_out2.json ...]

Each .json input is the one-line JSON written by `graft.Bench`
(bench_out.json) from a CLEAN local run at <sfName> (e.g. sf0.1). The
steady per query is the MINIMUM across all runs of all inputs — under
one-sided host noise the smallest observation is the closest to plan
cost.

`--floor` inputs are prior committed steady files (the same `name sec`
format this script writes). Their values participate in the per-query
min, so a noisy round can NEVER raise the floor of a plan-unchanged
query — only a deliberate floor-file omission can. This is the round-10
"min-merge with prior floors" protocol: pass every prior floor whose
queries' plans are unchanged; leave a query out of every floor file
(or delete its line) when its plan genuinely changed and its old floor
no longer describes the shipped code.

Writes src/main/resources/graft/bench_steady_<sfName>.txt (lines of
`name seconds`), which ships inside the jar. Driver-side tooling only —
the shipped library reads the resource, never this script.
"""
import json
import os
import sys


def load_floor(path):
    d = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, sec = line.split()
            d[name] = float(sec)
    return d


def main(sf_name, floor_paths, json_paths):
    best = {}
    for p in json_paths:
        with open(p) as f:
            art = json.load(f)
        for name, d in art["detail"].items():
            if not d.get("ok", False):
                continue
            lo = min(d.get("runs", [d["sec"]]))
            best[name] = min(best.get(name, lo), lo)
    # Prior floors only LOWER existing queries; a query present only in a
    # floor file but absent from every fresh sweep is dropped (it no
    # longer exists on the surface being benched).
    for fp in floor_paths:
        for name, sec in load_floor(fp).items():
            if name in best:
                best[name] = min(best[name], sec)
    out = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                       "resources", "graft", f"bench_steady_{sf_name}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(f"# per-query steady-state seconds at {sf_name}, min over "
                f"{len(json_paths)} clean run(s)"
                + (f" min-merged with {len(floor_paths)} prior floor file(s)"
                   if floor_paths else "")
                + "; regenerate: tools/make_steady.py\n")
        for name in sorted(best):
            f.write(f"{name} {best[name]:.3f}\n")
    print(f"wrote {out} ({len(best)} queries, sum "
          f"{sum(best.values()):.1f}s)")


if __name__ == "__main__":
    args = sys.argv[1:]
    if len(args) < 2:
        sys.exit(__doc__)
    sf = args[0]
    floors, jsons = [], []
    rest = args[1:]
    i = 0
    while i < len(rest):
        if rest[i] == "--floor":
            floors.append(rest[i + 1])
            i += 2
        else:
            jsons.append(rest[i])
            i += 1
    if not jsons:
        sys.exit(__doc__)
    main(sf, floors, jsons)
