#!/usr/bin/env python3
"""Sampled exact oracle for the sf0.1 quadratic-oracle queries (VERDICT r8 #4).

The 7 dedup/decontamination oracles are deliberately all-pairs (an
independent oracle must not share the engine's inverted-index/LSH
algorithm), so at sf0.1 they exceed the 120 s DuckDB bound. This tool
materializes a DETERMINISTIC content-hash subset of the sf0.1
documents table — `md5(text) mod N == 0`, independent of row order and
of both engines' internal hash functions — into a sampled sfDir whose
other 9 tables are symlinks. The REAL gate queries and the REAL
oracles then run UNMODIFIED on that dir:

    # mod 4 (~1/4 of the docs) fits 5 of the 7 oracles in the bound:
    python3 tools/sampled_oracle.py                       # write the dir
    sbt -batch "runMain graft.Verify /tmp/graft_sampled_sf01 \
        /tmp/sampled_out dedup_minhash_lsh,dedup_ngram_jaccard,\
        dedup_containment,dedup_incremental_neardup,split_decontaminate"
    python3 tools/check.py /tmp/sampled_out /tmp/graft_sampled_sf01 120
    # dedup_clusters / dedup_keep_representatives carry a recursive-CTE
    # connected-components oracle on top of the all-pairs edge set —
    # they need the smaller mod-8 subset (~650 docs) to fit:
    python3 tools/sampled_oracle.py /root/testdata/sf0.1 \
        /tmp/graft_sampled_sf01_m8 8
    sbt -batch "runMain graft.Verify /tmp/graft_sampled_sf01_m8 \
        /tmp/sampled_out_m8 dedup_clusters,dedup_keep_representatives"
    python3 tools/check.py /tmp/sampled_out_m8 /tmp/graft_sampled_sf01_m8 120

With mod N the subset keeps ~1/N of the documents, cutting the
all-pairs oracle cost ~N^2x — inside the bound — while every document
is a true sf0.1 document. A hash-match here is a full independent-
oracle verification of the engine's restricted output at bench scale
(recorded per query in BASELINE.md's oracle-timeout register).
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(src, dst, mod):
    # symlink targets are stored verbatim and resolved relative to the
    # DST dir, not the invocation cwd — absolutize so a relative src
    # cannot produce silently dangling links
    src = os.path.abspath(src)
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        if t == "documents":
            continue
        link = f"{dst}/{t}.parquet"
        # lexists (not exists): a dangling symlink must be replaced,
        # not crash; and a re-run with a DIFFERENT src must re-point
        # every link instead of silently keeping a mixed-scale dir
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(f"{src}/{t}.parquet", link)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/documents.parquet') "
        f"WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % {mod} = 0 "
        f"ORDER BY doc_id) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    n, = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()
    total, = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/documents.parquet')").fetchone()
    print(f"sampled {n}/{total} documents (md5(text) % {mod} == 0) -> {dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sampled_sf01"
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    main(src, dst, mod)
