#!/usr/bin/env python3
"""Merge three driver-protocol bench runs (sf0.001 / sf0.01 / sf0.1) into a
per-query scaling table for BASELINE.md.

Usage: python3 tools/scale_audit.py out_sf0.001.json out_sf0.01.json out_sf0.1.json

Each input is the one-line JSON written by `graft.Bench` (bench_out.json).
Prints a markdown table of per-query seconds at each SF plus the ratio
sf0.1/sf0.01 (rows grow 10x between those points for the star schema;
documents 10x, embeddings 4x), flagging queries whose growth exceeds the
row-growth factor (empirically superlinear).
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
    # union across runs: a query dropped from (or added to) the surface
    # between SFs still shows, with '-' cells, instead of vanishing
    names = sorted({n for r in runs for n in r["queries"]})
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.1/0.01 | flag |")
    print("|---|---|---|---|---|---|")
    flagged = []
    for n in names:
        secs = [r["queries"].get(n) for r in runs]
        ratio = (secs[2] / secs[1]) if secs[1] and secs[2] else float("nan")
        flag = "SUPER" if ratio > growth_factor(n) else ""
        if flag:
            flagged.append((n, ratio))
        cells = " | ".join("-" if s is None else f"{s:.2f}" for s in secs)
        print(f"| {n} | {cells} | {ratio:.2f} | {flag} |")
    tot = [r["value"] for r in runs]
    print(f"\ntotals: sf0.001 {tot[0]:.1f}s, sf0.01 {tot[1]:.1f}s, "
          f"sf0.1 {tot[2]:.1f}s; stalls retimed: "
          f"{[r.get('stalls_retimed') for r in runs]}; "
          f"gc totals: {[round(r.get('gc_total', 0), 2) for r in runs]}")
    if flagged:
        print(f"superlinear: {flagged}")
    else:
        print("no query grows faster than row count between sf0.01 and sf0.1")


if __name__ == "__main__":
    main(sys.argv[1:4])
