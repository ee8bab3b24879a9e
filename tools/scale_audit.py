#!/usr/bin/env python3
"""Merge driver-protocol bench runs at increasing SFs into a per-query
scaling table for BASELINE.md.

Usage:
  python3 tools/scale_audit.py out_sf0.001.json out_sf0.01.json out_sf0.1.json [out_sf0.3.json]

Each input is the one-line JSON written by `graft.Bench` (bench_out.json).
Prints a markdown table of per-query seconds at each SF plus the ratio
sf0.1/sf0.01 (rows grow 10x between those points for the star schema;
documents 10x, embeddings 4x), flagging queries whose growth exceeds the
row-growth factor (empirically superlinear).

The optional 4th artifact is the LOCAL ~sf0.3 corpus built by
`tools/make_sf03.py` (3 decorrelated key-shifted copies of sf0.1 —
EVERY table grows exactly 3x there, so the 0.3/0.1 ratio is flagged
against a uniform 3x factor). It adds a second decade-ish point to the
no-superlinear claim, per the round-5 verdict's next-round #7.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def growth_factor(name):
    """Row growth sf0.01 -> sf0.1 for the table family a query reads:
    embeddings grow 4x (500 -> 2000), documents and the star schema 10x.
    A query is only superlinear past ITS family's factor.

    NOTE: this prefix list must track the Scala query registry — a new
    embeddings-reading query outside these prefixes silently inherits the
    10x threshold (review finding; the registry does not export per-query
    source tables, so the mapping lives here)."""
    if name.startswith(("q_sim_", "q_dedup_embed", "q_knn", "q_ml_")):
        return 4.0
    return 10.0


def main(paths):
    runs = [load(p) for p in paths]
    has4 = len(runs) >= 4
    names = sorted({n for r in runs for n in r["queries"]})
    hdr = "| query | sf0.001 s | sf0.01 s | sf0.1 s |"
    sep = "|---|---|---|---|"
    if has4:
        hdr += " sf0.3 s |"
        sep += "---|"
    hdr += " 0.1/0.01 |"
    sep += "---|"
    if has4:
        hdr += " 0.3/0.1 |"
        sep += "---|"
    print(hdr + " flag |")
    print(sep + "---|")
    flagged = []
    for n in names:
        secs = [r["queries"].get(n) for r in runs]
        ratio = (secs[2] / secs[1]) if secs[1] and secs[2] else float("nan")
        flags = []
        if ratio > growth_factor(n):
            flags.append("SUPER")
        r3 = float("nan")
        if has4:
            r3 = (secs[3] / secs[2]) if secs[2] and secs[3] else float("nan")
            # local sf0.3 replicates every table exactly 3x
            if r3 > 3.0:
                flags.append("SUPER03")
        if flags:
            flagged.append((n, round(ratio, 2), round(r3, 2) if has4 else None))
        cells = " | ".join("-" if s is None else f"{s:.2f}" for s in secs)
        row = f"| {n} | {cells} | {ratio:.2f} |"
        if has4:
            row += f" {r3:.2f} |"
        print(row + f" {','.join(flags)} |")
    tot = [r["value"] for r in runs]
    print(f"\ntotals: " + ", ".join(
        f"{p.split('/')[-1]} {t:.1f}s" for p, t in zip(paths, tot)) +
        f"; stalls retimed: {[r.get('stalls_retimed') for r in runs]}; "
        f"gc totals: {[round(r.get('gc_total', 0), 2) for r in runs]}")
    if flagged:
        print(f"superlinear: {flagged}")
    else:
        msg = "no query grows faster than row count between sf0.01 and sf0.1"
        if has4:
            msg += " nor between sf0.1 and the local 3x sf0.3"
        print(msg)


if __name__ == "__main__":
    main(sys.argv[1:5])
