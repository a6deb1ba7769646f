#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output against
DuckDB oracle SQL and diff. Dev tool only (driver-side python libs), not part
of the engine. Usage: python3 tools/check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
# optional 3rd arg: comma-separated query-name subset (resume / re-check)
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
# DuckDB's sort memory scales with thread count — at sf1 the suffix-array
# oracles (15M materialized suffix strings) pass at 8 threads / 48GB but
# blow the limit at the 32-thread default. Cap threads, overridable.
THREADS = os.environ.get("CHECK_THREADS", "8")

def fresh_con():
    c = duckdb.connect(config={"memory_limit": "48GB"})
    c.execute(f"SET threads TO {THREADS}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return c

con = fresh_con()

def run_oracle(sql):
    # the heaviest oracles (q_graph_kcore's recursive peel) can OOM a
    # connection whose buffer pool is full of earlier queries' blocks —
    # one retry on a FRESH connection separates "oracle too big" from
    # "connection full"
    global con
    try:
        return con.execute(sql).df()
    except duckdb.OutOfMemoryException:
        try:
            con.close()
        except Exception:
            pass
        con = None          # drop the dead handle BEFORE allocating anew —
        import gc; gc.collect()  # a 48GB pool pinned by the old connection
        con = fresh_con()        # would otherwise OOM the fresh one too
        return con.execute(sql).df()

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
# CHECK_JSON=<path>: also write a driver-format per-query JSON artifact
# ({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err})
# so scale-gate runs can be committed like CORRECTNESS_r{N}.json
json_out = os.environ.get("CHECK_JSON")
report = {}
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
if only is not None:
    names = [n for n in names if n in only]
for name in names:
    spark_df = pd.read_parquet(f"{out}/{name}")
    if name not in oracle:
        print(f"[rows-only] {name}: {len(spark_df)} rows")
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": len(spark_df),
                        "oracle_rows": None, "err": "no_oracle"}
        continue
    try:
        duck_df = run_oracle(oracle[name])
    except Exception as e:
        fail += 1
        print(f"[FAIL] {name}: oracle raised {type(e).__name__}: {str(e)[:200]}")
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": len(spark_df),
                        "oracle_rows": None,
                        "err": f"oracle {type(e).__name__}"}
        continue
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    d = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    problems = []
    # Mirror the driver's comparator: it lexsorts rows (sort_values over all
    # columns) before hashing, and pandas' sort crashes on unhashable
    # array/struct cells — so (a) reject nested cells loudly instead of
    # silently stringifying them, (b) sort the same way the driver does.
    nested = [c for c in s.columns
              if len(s) and isinstance(s[c].iloc[0], (np.ndarray, list, dict))]
    nested += [c for c in d.columns
               if len(d) and isinstance(d[c].iloc[0], (np.ndarray, list, dict))]
    if nested:
        fail += 1
        print(f"[FAIL] {name}: array/struct-typed output column(s) "
              f"{sorted(set(nested))} — driver comparator cannot hash these; "
              f"emit a scalar (e.g. array_join) instead")
        continue
    if len(s):
        s = s.sort_values(list(s.columns), kind="mergesort").reset_index(drop=True)
    if len(d):
        d = d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)
    if list(s.columns) != list(d.columns):
        problems.append(f"cols spark={list(s.columns)} duck={list(d.columns)}")
    elif len(s) != len(d):
        problems.append(f"rowcount spark={len(s)} duck={len(d)}")
    else:
        for c in s.columns:
            sv, dv = s[c], d[c]
            if str(sv.dtype) != str(dv.dtype):
                problems.append(f"dtype[{c}] spark={sv.dtype} duck={dv.dtype}")
            # value compare via string repr (like a hash would see)
            a = sv.astype(str).values
            b = dv.astype(str).values
            neq = a != b
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(f"value[{c}] row{i}: spark={a[i]!r} duck={b[i]!r} ({int(neq.sum())} diffs)")
    if problems:
        fail += 1
        print(f"[FAIL] {name}: " + "; ".join(problems[:4]))
    else:
        print(f"[ok]   {name}: {len(s)} rows")
    rows_ok = len(spark_df) == len(duck_df)
    cols_ok = list(s.columns) == list(d.columns)
    report[name] = {"rows_match": rows_ok, "schema_match": cols_ok,
                    "hash_match": not problems,
                    "spark_rows": len(spark_df),
                    "oracle_rows": len(duck_df),
                    "err": "; ".join(problems[:4]) if problems else None}
# compute "missing" against the FULL directory listing, not the optional
# subset filter — else every deliberately-excluded entry warns on resume runs
all_names = set(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
missing = set(oracle) - all_names
# a subset run (Verify called with an explicit query list writes only
# those result dirs) legitimately lacks everything outside the subset
if only is not None:
    missing &= only
if missing:
    print(f"[warn] oracle entries without results: {sorted(missing)}")
if json_out:
    with open(json_out, "w") as fh:
        json.dump(dict(sorted(report.items())), fh, indent=1)
    print(f"[json] wrote {json_out} ({len(report)} queries)")
print(f"{len(names)-fail}/{len(names)} pass")
sys.exit(1 if fail else 0)
