#!/usr/bin/env python3
"""Build a local ~sf0.3 corpus by stacking 3 key-shifted copies of the
driver's sf0.1 tables — the extra decade point for the scale audit
(round-5 VERDICT next-round #7; the driver ships no SF above 0.1).

Usage: python3 tools/make_sf03.py [src_dir] [dst_dir] [n_copies]
Defaults: /root/testdata/sf0.1 -> /tmp/graft_sf0.3, 3 copies
(n_copies=10 builds a ~sf1 corpus for the second audit decade)

Driver-side tooling only (duckdb), like the oracle checker — the shipped
library stays pure Scala/Spark.

Copy decorrelation matters more than realism here: a naive 3x stack
makes every document/vector an exact near-dup of its copies, which
inflates dedup cluster sizes and LSH bucket occupancy QUADRATICALLY —
the audit would then flag superlinearity that is a property of the
synthetic stacking, not of the operators. So copies 1 and 2 are
deterministically mangled into non-duplicates:
  - documents: per-copy Caesar rotation of the lowercase alphabet
    (copy 0 identity; i>0 shifts EVERY letter, so every shingle
    differs -> Jaccard ~0 across copies; length, and thus n_chars
    consistency, is preserved)
  - embeddings: per-copy dimension rotation (cosine across copies
    decorrelates like random vectors)
  - star schema + events: pure key shifts; FK targets shift with their
    dims so referential integrity stays clean by construction
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf0.3"
NCOPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    t = {n: f"'{SRC}/{n}.parquet'" for n in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"]}

    def write(name, sql):
        # Small row groups (duckdb's default is 122880 rows): Spark's
        # file-split planner assigns a parquet ROW GROUP to the split
        # containing its midpoint, so a one-row-group file runs every
        # per-row mapPartitions pipeline on ONE task no matter how many
        # byte-range splits exist. The round-8 audit's 11 "saturation"
        # flags were mostly THIS corpus artifact (single-task decode at
        # sf1, two skewed tasks at sf3), not engine behavior — 8192-row
        # groups let local[32] parallelize the audit points the way the
        # driver's own corpora do.
        con.execute(
            f"COPY ({sql}) TO '{DST}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 8192)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # key offsets: one per shifted key space, from the source maxima
    mx = {k: con.sql(s).fetchone()[0] + 1 for k, s in {
        "cust": f"SELECT max(c_custkey) FROM {t['customer']}",
        "supp": f"SELECT max(s_suppkey) FROM {t['supplier']}",
        "part": f"SELECT max(p_partkey) FROM {t['part']}",
        "ord": f"SELECT max(o_orderkey) FROM {t['orders']}",
        "evt": f"SELECT max(event_id) FROM {t['events']}",
        "user": f"SELECT max(user_id) FROM {t['events']}",
        "doc": f"SELECT max(doc_id) FROM {t['documents']}",
        "vec": f"SELECT max(vec_id) FROM {t['embeddings']}",
    }.items()}

    def copies(sql_for_copy):
        return " UNION ALL ".join(sql_for_copy(i) for i in range(NCOPIES))

    # dimensions shared across copies stay single (region/nation: the
    # FK columns into them are NOT shifted)
    for dim in ("region", "nation"):
        write(dim, f"SELECT * FROM {t[dim]}")

    write("customer", copies(lambda i: (
        f"SELECT c_custkey + {i * mx['cust']} AS c_custkey, "
        f"c_name, c_nationkey, c_acctbal, c_mktsegment FROM {t['customer']}")))
    write("supplier", copies(lambda i: (
        f"SELECT s_suppkey + {i * mx['supp']} AS s_suppkey, "
        f"s_name, s_nationkey, s_acctbal FROM {t['supplier']}")))
    write("part", copies(lambda i: (
        f"SELECT p_partkey + {i * mx['part']} AS p_partkey, "
        f"p_name, p_brand, p_type, p_size, p_retailprice FROM {t['part']}")))
    write("orders", copies(lambda i: (
        f"SELECT o_orderkey + {i * mx['ord']} AS o_orderkey, "
        f"o_custkey + {i * mx['cust']} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM {t['orders']}")))
    write("lineitem", copies(lambda i: (
        f"SELECT l_orderkey + {i * mx['ord']} AS l_orderkey, "
        f"l_partkey + {i * mx['part']} AS l_partkey, "
        f"l_suppkey + {i * mx['supp']} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM {t['lineitem']}")))
    write("events", copies(lambda i: (
        f"SELECT event_id + {i * mx['evt']} AS event_id, ts, "
        f"user_id + {i * mx['user']} AS user_id, "
        f"event_type, value, props FROM {t['events']}")))

    # rotate lower, UPPER, and digits: a lowercase-only rotation left
    # uppercase/numeric text unchanged across copies, partially
    # re-introducing the cross-copy near-duplicates the mangling exists
    # to remove (round-6 ADVICE)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    src = alpha + alpha.upper() + digits

    def caesar(i):
        lo = alpha[i % 26:] + alpha[:i % 26]
        dg = digits[i % 10:] + digits[:i % 10]
        return lo + lo.upper() + dg

    write("documents", copies(lambda i: (
        f"SELECT doc_id + {i * mx['doc']} AS doc_id, "
        f"translate(text, '{src}', '{caesar(i)}') AS text, "
        f"lang, source, n_chars FROM {t['documents']}")))

    def perm(i):
        if i == 0:
            return "embedding"
        k = 1 + (6 * i) % 62   # rotate dims by a copy-dependent stride
        return f"embedding[{k + 1}:] || embedding[1:{k}]"

    write("embeddings", copies(lambda i: (
        f"SELECT vec_id + {i * mx['vec']} AS vec_id, "
        f"CAST({perm(i)} AS FLOAT[]) AS embedding, label "
        f"FROM {t['embeddings']}")))


if __name__ == "__main__":
    main()
