#!/usr/bin/env python3
"""sf1 correctness sweep compare: graft.Verify output at sf1 vs the
DuckDB oracles, producing a CORRECTNESS-style artifact.

Differences from tools/check.py (the sf0.01 gate stand-in):

- Each oracle runs in its OWN subprocess with a wall-clock budget
  (default 300 s) — at 6.1M docs some corpus-explode oracles are far
  slower in DuckDB than the Spark side; a budget overrun records
  "oracle_timeout" instead of wedging the sweep.
- Depth-tuned unrolled oracles (the k-core/k-truss peels) are checked
  only when the Spark log proves the sf1 convergence depth fits the
  oracle's unroll count; otherwise recorded as
  "oracle_unroll_shallower_than_sf1_depth" — the unroll counts were
  chosen for the sf0.01 gate and peel idempotence only covers
  rounds >= depth.

Usage: python3 tools/check_sf1.py [SF_DIR] [VERIFY_OUT] [ARTIFACT]
(defaults: /root/repo/testdata-sf1 /tmp/verify_sf1 CORRECTNESS_SF1.json)
"""
import glob
import json
import multiprocessing as mp
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
ARTIFACT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SF1.json"
BUDGET_S = int(sys.argv[4]) if len(sys.argv) > 4 else 300

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Unrolled-peel oracles whose round counts were tuned to sf0.01
# convergence depth all LOG their per-round depth now (KCore and
# KTruss), and the r9 sf1 sweep proved every measured depth fits its
# oracle's unroll (kcore k=3: 1 round vs 3 unrolled; truss levels
# 2/5/5/4 vs 4/5/6/8) — so nothing is depth-skipped; slow mirrors
# fall under the time budget instead.
DEPTH_TUNED = set()


def compare_one(name, sql, files, q):
    import os
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; GenSf's sf1 upsample
        # writes Spark-style directories of part files
        p = f"{SF}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        want = con.sql(sql).df()
    except Exception as e:
        q.put({"err": f"SQL ERROR: {str(e)[:200]}"})
        return

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        if len(df):
            df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df

    g, w = norm(got), norm(want)
    res = {"spark_rows": len(g), "oracle_rows": len(w),
           "rows_match": len(g) == len(w),
           "schema_match": list(g.columns) == list(w.columns)
           and [str(t) for t in g.dtypes] == [str(t) for t in w.dtypes],
           "err": None}
    res["hash_match"] = (res["rows_match"] and res["schema_match"]
                         and g.equals(w))
    q.put(res)


def main():
    import os
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    # resume: keep prior green/skip rows and flush after every query,
    # so a killed run leaves a usable artifact and a rerun only
    # retries what is still open
    results = {}
    if os.path.exists(ARTIFACT):
        prior = json.load(open(ARTIFACT))
        results = {k: v for k, v in prior.items()
                   if v.get("hash_match")
                   or (v.get("err") or "").startswith("skipped")}
    for name in sorted(oracle):
        if name in results:
            continue
        files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
        if not files:
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0,
                             "oracle_rows": 0, "err": "NO SPARK OUTPUT"}
            print(f"  MISS {name} (no spark output)", flush=True)
            continue
        if name in DEPTH_TUNED:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None,
                             "err": "skipped: oracle unroll depth tuned to "
                                    "the sf0.01 gate; sf1 peel depth not "
                                    "covered by the fixed round count"}
            print(f"  SKIP {name} (depth-tuned unroll)", flush=True)
            continue
        q = mp.Queue()
        p = mp.Process(target=compare_one, args=(name, oracle[name], files, q))
        p.start()
        p.join(BUDGET_S)
        if p.is_alive():
            p.terminate()
            p.join()
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"oracle_timeout>{BUDGET_S}s"}
            print(f"  TIME {name} (oracle exceeded {BUDGET_S}s)", flush=True)
            json.dump(results, open(ARTIFACT, "w"), indent=2)
            continue
        res = q.get() if not q.empty() else {"err": "worker died"}
        res.setdefault("rows_match", False)
        res.setdefault("schema_match", False)
        res.setdefault("hash_match", False)
        res.setdefault("spark_rows", None)
        res.setdefault("oracle_rows", None)
        res.setdefault("err", None)
        results[name] = res
        tag = ("ok" if res["hash_match"] else f"FAIL {res}")
        print(f"  {tag:4s} {name}" if res["hash_match"]
              else f"  FAIL {name}: {res}", flush=True)
        json.dump(results, open(ARTIFACT, "w"), indent=2)
    json.dump(results, open(ARTIFACT, "w"), indent=2)
    green = sum(1 for r in results.values() if r["hash_match"])
    skipped = sum(1 for r in results.values()
                  if r["err"] and r["err"].startswith(("skipped",
                                                       "oracle_timeout")))
    red = len(results) - green - skipped
    print(f"SF1 SWEEP: {green} green, {skipped} skipped (documented), "
          f"{red} red of {len(results)} -> {ARTIFACT}")


if __name__ == "__main__":
    main()
