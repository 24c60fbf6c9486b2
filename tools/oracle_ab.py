#!/usr/bin/env python3
"""A/B check: linear (shipped) vs quadratic (original) dedup oracles.

Round 14 rewrote seven DuckDB oracle formulations from all-pairs
`list_intersect` Jaccard/containment scans (quadratic in documents —
they hit the driver's 120 s oracle bound at sf0.1) to inverted-index
equivalents (unnest shingles -> equi-join on shingle -> shared counts;
Jaccard/containment computed from the SAME integer operands, so the
doubles are bit-identical). The engine side never changed.

This tool keeps the retired quadratic formulations as the A/B
reference: it reads the SHIPPED linear SQL from a Verify dump's
oracle_sql.json and asserts row-for-row equality against the quadratic
originals below, per scale factor. Run after any edit to the dedup
oracle family:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v"
    python3 tools/oracle_ab.py /tmp/v/oracle_sql.json \
        /root/testdata/sf0.001 /root/testdata/sf0.01

Writes ORACLE_AB.json next to the repo root (cwd).
"""
import json
import sys
import time

import duckdb

DUCKPOLY = ("list_reduce(list_transform(string_split(text, ''), "
            "x -> CAST(unicode(x) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007)")


def sh_cte(n):
    if n == 2:
        gen = "[ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]"
    else:
        gen = "[ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]"
    return f"""tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents),
sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(ws) >= {n}
    THEN {gen}
    ELSE [] END) AS shingles FROM tok)"""


def quad_pairs(n, thr):
    return f"""WITH {sh_cte(n)}
SELECT a.doc_id AS ia, b.doc_id AS ib,
  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
    / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
    / len(list_distinct(list_concat(a.shingles, b.shingles))) >= {thr}
ORDER BY ia, ib"""


QUAD_P3 = """p AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5)"""

QUAD_CLUSTERS = f"""WITH RECURSIVE {sh_cte(3)},
{QUAD_P3},
e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
reach(a, b) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, r.b FROM e JOIN reach r ON e.b = r.a)
SELECT a AS doc_id, min(b) AS cluster_id FROM reach
GROUP BY a ORDER BY doc_id"""

QUAD_KEEP_REPS = f"""WITH RECURSIVE {sh_cte(3)},
{QUAD_P3},
ex AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM documents a JOIN documents b
  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p
      UNION SELECT ia, ib FROM ex UNION SELECT ib, ia FROM ex),
reach(a, b) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, r.b FROM e JOIN reach r ON e.b = r.a),
losers AS (
  SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) <> a)
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY doc_id"""

QUAD_CONTAINMENT = f"""WITH {sh_cte(2)},
p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
    CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / len(a.shingles) AS containment_a,
    CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / len(b.shingles) AS containment_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.shingles) > 0 AND len(b.shingles) > 0)
SELECT ia, ib, containment_a, containment_b FROM p
WHERE greatest(containment_a, containment_b) >= 0.8
ORDER BY ia, ib"""

QUAD_INC_NEARDUP = f"""WITH {sh_cte(2)},
b AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
e AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
cb AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n
  FROM b JOIN e ON
    CAST(len(list_intersect(b.shingles, e.shingles)) AS DOUBLE)
      / len(list_distinct(list_concat(b.shingles, e.shingles))) >= 0.5
  GROUP BY b.doc_id),
clean AS (SELECT doc_id, shingles FROM b
  WHERE doc_id NOT IN (SELECT doc_id FROM cb)),
pb AS (SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n
  FROM b x JOIN clean p ON p.doc_id < x.doc_id
    AND CAST(len(list_intersect(x.shingles, p.shingles)) AS DOUBLE)
      / len(list_distinct(list_concat(x.shingles, p.shingles))) >= 0.5
  GROUP BY x.doc_id)
SELECT b.doc_id,
  coalesce(cb.n, 0) AS n_corpus_blockers,
  coalesce(pb.n, 0) AS n_peer_blockers,
  CAST(CASE WHEN coalesce(cb.n, 0) = 0 AND coalesce(pb.n, 0) = 0
    THEN 1 ELSE 0 END AS INT) AS admitted
FROM b LEFT JOIN cb ON b.doc_id = cb.doc_id
LEFT JOIN pb ON b.doc_id = pb.doc_id
ORDER BY b.doc_id"""

QUAD_SPLIT_DECON = f"""WITH h AS (SELECT doc_id, {DUCKPOLY} % 100 AS split_hash,
    text FROM documents),
sp AS (SELECT doc_id, split_hash,
    CASE WHEN split_hash < 80 THEN 'train'
         WHEN split_hash < 90 THEN 'val' ELSE 'test' END AS split,
    text FROM h),
tok AS (SELECT doc_id, split, split_hash,
    list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM sp),
sh AS (SELECT doc_id, split, split_hash,
    list_distinct(CASE WHEN len(ws) >= 2
      THEN [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
      ELSE [] END) AS shingles FROM tok),
leak AS (SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_leak_partners
  FROM sh a JOIN sh b ON a.split <> 'test' AND b.split = 'test'
    AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
  GROUP BY a.doc_id)
SELECT s.doc_id, s.split_hash, s.split,
  coalesce(l.n_leak_partners, 0) AS n_leak_partners,
  CAST(CASE WHEN s.split <> 'test' AND coalesce(l.n_leak_partners, 0) > 0
    THEN 0 ELSE 1 END AS INT) AS kept
FROM sp s LEFT JOIN leak l ON s.doc_id = l.doc_id
ORDER BY s.doc_id"""

QUAD_FUZZY_ED1 = """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
  AND abs(length(a.c_name) - length(b.c_name)) <= 1
  AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a_id, b_id"""

QUADRATIC = {
    "dedup_minhash_lsh": quad_pairs(3, 0.5),
    "dedup_ngram_jaccard": quad_pairs(2, 0.5),
    "dedup_clusters": QUAD_CLUSTERS,
    "dedup_keep_representatives": QUAD_KEEP_REPS,
    "dedup_containment": QUAD_CONTAINMENT,
    "dedup_incremental_neardup": QUAD_INC_NEARDUP,
    "split_decontaminate": QUAD_SPLIT_DECON,
    "fuzzy_join_ed1": QUAD_FUZZY_ED1,
}

TABLES = ["customer", "documents"]


def main(oracle_json, sf_dirs):
    shipped = json.load(open(oracle_json))
    report = {"oracle_json": oracle_json, "sf_dirs": sf_dirs, "results": []}
    n_fail = 0
    for name, quad in sorted(QUADRATIC.items()):
        lin = shipped.get(name)
        if lin is None:
            print(f"  {name}: MISSING from oracle_sql.json")
            n_fail += 1
            continue
        if "list_intersect" in lin or (name == "fuzzy_join_ed1"
                                       and "JOIN customer b" in lin):
            print(f"  {name}: shipped SQL still the quadratic all-pairs form")
            n_fail += 1
            continue
        for sf in sf_dirs:
            con = duckdb.connect()
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{sf}/{t}.parquet')")
            t0 = time.time()
            a = con.execute(quad).fetchall()
            t1 = time.time()
            b = con.execute(lin).fetchall()
            t2 = time.time()
            same = a == b
            if not same:
                n_fail += 1
            print(f"  {name} @ {sf}: quad={len(a)} lin={len(b)} "
                  f"identical={same} (quad {t1-t0:.2f}s, lin {t2-t1:.2f}s)")
            report["results"].append({
                "query": name, "sf_dir": sf, "rows_quadratic": len(a),
                "rows_linear": len(b), "identical": same,
                "quadratic_s": round(t1 - t0, 3),
                "linear_s": round(t2 - t1, 3)})
    report["n_fail"] = n_fail
    with open("ORACLE_AB.json", "w") as f:
        json.dump(report, f, indent=1)
    print(f"== {len(report['results'])} comparisons, {n_fail} fail "
          f"-> ORACLE_AB.json")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
