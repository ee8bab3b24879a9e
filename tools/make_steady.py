#!/usr/bin/env python3
"""Regenerate the committed per-query steady-state reference that
`graft.Bench` embeds in its artifact and uses as its re-time trigger.

Usage:
  python3 tools/make_steady.py <sfName> bench_out1.json [bench_out2.json ...]

Each input is the one-line JSON written by `graft.Bench` (bench_out.json)
from a CLEAN local run at <sfName> (e.g. sf0.1). The steady per query is
the MINIMUM across all runs of all inputs — under one-sided host noise
the smallest observation is the closest to plan cost.

Writes src/main/resources/graft/bench_steady_<sfName>.txt (lines of
`name seconds`), which ships inside the jar. Driver-side tooling only —
the shipped library reads the resource, never this script.
"""
import json
import os
import sys


def main(sf_name, paths):
    best = {}
    for p in paths:
        with open(p) as f:
            art = json.load(f)
        for name, d in art["detail"].items():
            if not d.get("ok", False):
                continue
            lo = min(d.get("runs", [d["sec"]]))
            best[name] = min(best.get(name, lo), lo)
    out = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                       "resources", "graft", f"bench_steady_{sf_name}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(f"# per-query steady-state seconds at {sf_name}, min over "
                f"{len(paths)} clean run(s); regenerate: tools/make_steady.py\n")
        for name in sorted(best):
            f.write(f"{name} {best[name]:.3f}\n")
    print(f"wrote {out} ({len(best)} queries)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
