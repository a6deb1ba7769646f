#!/usr/bin/env python3
"""Scale-gate wrapper around check.py: one FRESH python process per query
family, merged into a single driver-format JSON artifact.

Why: a single long-lived check.py process accumulates pandas/duckdb RSS
across oracles (~46 GB after 100+ queries at sf1, the binding constraint
found by the round-11 sf10 probe — PERF.md round-11 operational finding
#2). DuckDB's buffer pool and pandas' per-result frames are only reliably
returned to the OS at process exit, so the scale gates segment the oracle
run: each family (id prefix group, chunked to <= --chunk oracles) gets a
fresh interpreter, its per-query report lands in a part file, and the
parts merge into one CORRECTNESS-format JSON. A family that dies (OOM
kill) costs only its own chunk — the merge records the casualty instead
of losing the run.

Usage:
  python3 tools/check_families.py <sfDir> <verifyOutDir> --json OUT.json \
      [--chunk 12] [--skip id1,id2,...] [--only id1,...]

--skip ids are recorded as {"err": "skipped: <reason arg>"} placeholders —
the caller is expected to replace them with property-gate results (the
suffix brute-force oracles at sf10, where materializing+sorting 150M
suffix strings exceeds the box).

Dev tool only (driver-side python), not part of the engine.
"""
import sys, os, json, argparse, subprocess, tempfile, collections, time

ap = argparse.ArgumentParser()
ap.add_argument("sf")
ap.add_argument("out")
ap.add_argument("--json", required=True)
ap.add_argument("--chunk", type=int, default=12,
                help="max oracles per fresh process")
ap.add_argument("--skip", default="",
                help="comma-separated ids to skip (property-gated elsewhere)")
ap.add_argument("--skip-reason", default="property-gated separately")
ap.add_argument("--only", default="", help="restrict to these ids")
ap.add_argument("--chunk-timeout", type=int, default=0,
                help="seconds before a chunk's process is killed (0 = none); "
                     "a timed-out chunk is retried one id at a time so one "
                     "hog oracle can't take its family down with it")
args = ap.parse_args()

names = sorted(d for d in os.listdir(args.out)
               if os.path.isdir(os.path.join(args.out, d)))
if args.only:
    only = set(args.only.split(","))
    names = [n for n in names if n in only]
skip = set(s for s in args.skip.split(",") if s)

# family = first two tokens of the id (q_dedup, q_sc, ...): keeps fixture-
# and plan-related oracles together, then chunked so no process runs more
# than --chunk oracles before its RSS is returned to the OS
fams = collections.OrderedDict()
for n in names:
    if n in skip:
        continue
    fams.setdefault("_".join(n.split("_")[:2]), []).append(n)
chunks = []
for fam, ids in fams.items():
    for i in range(0, len(ids), args.chunk):
        chunks.append((fam, ids[i:i + args.chunk]))

report = {n: {"rows_match": None, "schema_match": None, "hash_match": None,
              "spark_rows": None, "oracle_rows": None,
              "err": f"skipped: {args.skip_reason}"} for n in skip
          if n in names}
t0 = time.time()
fail_chunks = []
here = os.path.dirname(os.path.abspath(__file__))
def run_chunk(ids):
    """One fresh check.py process over `ids`; returns (report_dict, rc).
    rc -9/-15 = killed (OOM); 'timeout' = exceeded --chunk-timeout."""
    part = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
    env = dict(os.environ, CHECK_JSON=part)
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "check.py"),
             args.sf, args.out, ",".join(ids)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, timeout=(args.chunk_timeout or None))
        rc, out = p.returncode, p.stdout
    except subprocess.TimeoutExpired as e:
        rc, out = "timeout", (e.stdout or "")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
    got = {}
    try:
        with open(part) as fh:
            got = json.load(fh)
    except Exception:
        pass
    if os.path.exists(part):
        os.unlink(part)
    for n in ids:  # ids a dead/timed-out process never reported
        got.setdefault(n, {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None,
            "err": f"check process {'timed out' if rc == 'timeout' else f'died rc={rc}'}"})
    return got, rc, out


for i, (fam, ids) in enumerate(chunks):
    t = time.time()
    got, rc, out = run_chunk(ids)
    if rc == "timeout" and len(ids) > 1:
        # isolate the hog: one fresh process per id, same timeout each
        print(f"[{i+1}/{len(chunks)}] {fam} x{len(ids)} TIMEOUT — "
              f"retrying one id at a time", flush=True)
        got = {}
        for n in ids:
            g1, rc1, _ = run_chunk([n])
            got.update(g1)
            if rc1 not in (0,):
                fail_chunks.append(f"{fam}:{n}")
    dt = time.time() - t
    tail = out.strip().splitlines()[-3:] if out else []
    print(f"[{i+1}/{len(chunks)}] {fam} x{len(ids)} rc={rc} "
          f"{dt:.0f}s | " + " | ".join(tail), flush=True)
    report.update(got)
    if rc != 0:
        fail_chunks.append(fam)

with open(args.json, "w") as fh:
    json.dump(dict(sorted(report.items())), fh, indent=1)
n_pass = sum(1 for v in report.values() if v.get("hash_match"))
n_noracle = sum(1 for v in report.values()
                if v.get("err") == "no_oracle")
n_skip = sum(1 for v in report.values()
             if str(v.get("err", "")).startswith("skipped:"))
n_fail = len(report) - n_pass - n_noracle - n_skip
print(f"[merge] {args.json}: {len(report)} ids | {n_pass} hash-pass | "
      f"{n_noracle} no_oracle | {n_skip} skipped | {n_fail} FAIL | "
      f"{time.time()-t0:.0f}s total")
sys.exit(1 if n_fail else 0)
