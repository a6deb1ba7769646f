#!/usr/bin/env python3
"""Property gates for the sf10 ids whose brute-force DuckDB oracles provably
cannot run on this box (materializing + sorting 150M suffix strings: census
timed out >45 min at ~44 GB RSS in the round-11 probe; clip's per-char
anti-join would materialize ~2.6B rows). Each gate is an INDEPENDENT
derivation — cross-query consistency against a HASH-VERIFIED neighbor, the
generator's prefix-closure invariant against the hash-verified sf1 run, or
a structural bijection — recorded per id in driver CORRECTNESS format with
the reason in `err` ("property-gated: ..."), so the sf10 artifact states
exactly what was and wasn't DuckDB-verified.

Usage:
  python3 tools/sf10_gates.py <sf10VerifyOut> <sf1VerifyOut> <sfDir> \
      --json GATES.json

Gates:
  q_text_suffix_census  — exactly one row per doc (bijection with the
                          documents table, count + distinct-count).
  q_dedup_suffix_clip   — (a) n_chars − n_kept == dup_chars doc-by-doc
                          against q_dedup_suffix_coverage (which IS
                          DuckDB-verified at sf10); (b) prefix closure:
                          the first 50k docs are bit-identical to the
                          sf1 corpus (generator invariant, spot-checked
                          here by md5 over a doc sample), so a larger
                          corpus can only clip MORE: n_kept(sf10) <=
                          n_kept(sf1) for every shared doc, 0 violations.

Dev tool only (driver-side python), not part of the engine.
"""
import sys, json, argparse
import duckdb

ap = argparse.ArgumentParser()
ap.add_argument("sf10out")
ap.add_argument("sf1out")
ap.add_argument("sfdir", help="the sf10 parquet dir (documents count)")
ap.add_argument("--sf1dir", default="/tmp/graft_testdata/sf1")
ap.add_argument("--json", required=True)
args = ap.parse_args()

c = duckdb.connect(config={"memory_limit": "24GB"})
c.execute("SET threads TO 8")


def q1(sql):
    return c.execute(sql).fetchone()


report = {}
ndocs = q1(f"SELECT count(*) FROM read_parquet('{args.sfdir}/documents.parquet')")[0]

# --- census: one row per doc, exactly --------------------------------------
rows, distinct = q1(
    f"SELECT count(*), count(DISTINCT doc_id) FROM "
    f"read_parquet('{args.sf10out}/q_text_suffix_census/*.parquet')")
ok = rows == ndocs and distinct == ndocs
report["q_text_suffix_census"] = {
    "rows_match": ok, "schema_match": None, "hash_match": None,
    "spark_rows": rows, "oracle_rows": None,
    "err": ("property-gated: census bijection — one row per doc "
            f"({rows}/{ndocs}, distinct {distinct}); brute-force oracle "
            "sorts 150M materialized suffixes, >45min/44GB in the r11 probe"
            + ("" if ok else " — GATE FAILED"))}

# --- clip: consistency with the DuckDB-verified coverage + prefix closure --
rows, mismatch, neg = q1(f"""
 WITH cl AS (SELECT doc_id, n_chars, n_kept
             FROM read_parquet('{args.sf10out}/q_dedup_suffix_clip/*.parquet')),
      cv AS (SELECT doc_id, dup_chars
             FROM read_parquet('{args.sf10out}/q_dedup_suffix_coverage/*.parquet'))
 SELECT count(*),
        sum(CASE WHEN cl.n_chars - cl.n_kept = coalesce(cv.dup_chars, 0)
                 THEN 0 ELSE 1 END),
        sum(CASE WHEN cl.n_kept > cl.n_chars OR cl.n_kept < 0 THEN 1 ELSE 0 END)
 FROM cl LEFT JOIN cv USING (doc_id)""")
# prefix closure needs the shared-prefix doc count of the sf1 corpus
n_sf1 = q1(f"SELECT count(*) FROM read_parquet('{args.sf1dir}/documents.parquet')")[0]
same = q1(f"""
 SELECT count(*) FROM (
   SELECT doc_id, md5(text) h
   FROM read_parquet('{args.sfdir}/documents.parquet')
   WHERE doc_id % 4999 = 1 AND doc_id < {n_sf1}) a
 JOIN (
   SELECT doc_id, md5(text) h
   FROM read_parquet('{args.sf1dir}/documents.parquet')
   WHERE doc_id % 4999 = 1) b
 USING (doc_id) WHERE a.h = b.h""")[0]
sampled = q1(f"""
 SELECT count(*) FROM read_parquet('{args.sf1dir}/documents.parquet')
 WHERE doc_id % 4999 = 1""")[0]
shared, viol = q1(f"""
 WITH a AS (SELECT doc_id, n_kept
            FROM read_parquet('{args.sf10out}/q_dedup_suffix_clip/*.parquet')
            WHERE doc_id < {n_sf1}),
      b AS (SELECT doc_id, n_kept
            FROM read_parquet('{args.sf1out}/q_dedup_suffix_clip/*.parquet'))
 SELECT count(*), sum(CASE WHEN a.n_kept <= b.n_kept THEN 0 ELSE 1 END)
 FROM a JOIN b USING (doc_id)""")
ok = (rows == ndocs and mismatch == 0 and neg == 0
      and shared == n_sf1 and viol == 0 and same == sampled)
report["q_dedup_suffix_clip"] = {
    "rows_match": ok, "schema_match": None, "hash_match": None,
    "spark_rows": rows, "oracle_rows": None,
    "err": ("property-gated: (a) n_chars-n_kept == DuckDB-verified coverage "
            f"dup_chars doc-by-doc ({rows} docs, {mismatch} mismatches, "
            f"{neg} out-of-range); (b) prefix closure vs hash-verified sf1 "
            f"clip: n_kept(sf10) <= n_kept(sf1) on all {shared} shared docs, "
            f"{viol} violations (corpus prefix identity spot-checked: "
            f"{same}/{sampled} sampled docs md5-equal); per-char anti-join "
            "oracle would materialize ~2.6B rows"
            + ("" if ok else " — GATE FAILED"))}

with open(args.json, "w") as fh:
    json.dump(report, fh, indent=1)
n_ok = sum(1 for v in report.values() if v["rows_match"])
print(json.dumps(report, indent=1))
print(f"[gates] {n_ok}/{len(report)} property gates pass -> {args.json}")
sys.exit(0 if n_ok == len(report) else 1)
