#!/usr/bin/env python3
"""sf1 correctness sweep compare: graft.Verify output at sf1 vs the
DuckDB oracles, producing a CORRECTNESS-style artifact.

Differences from tools/check.py (the sf0.01 gate stand-in):

- Each oracle runs in its OWN subprocess with a wall-clock budget
  (default 300 s, per-name overrides for the known compute-heavy
  mirrors) — a budget overrun records "oracle_timeout" instead of
  wedging the sweep.
- Both sides are materialized ONCE into DuckDB temp tables; results
  small enough for pandas take the exact tools/check.py compare, and
  larger ones take an order-independent in-database fingerprint
  (count + sum of per-row hashes over name-sorted, zero-normalized
  columns) so a 24M-row unpivot no longer needs a 150 s pandas sort
  to be compared.
- Depth-tuned unrolled oracles (the k-core/k-truss peels) are checked
  only when the Verify stderr log proves the sf1 convergence depth
  fits the oracle's unroll count (the [kcore]/[ktruss] fixpoint
  lines); without a log, or with a measured depth past the unroll,
  they are recorded as skips instead of publishing a wrong-by-
  construction red.
- Resume rows are keyed on a hash of the oracle SQL: a rerun after
  query/oracle edits re-verifies instead of carrying stale greens.

Usage: python3 tools/check_sf1.py [SF_DIR] [VERIFY_OUT] [ARTIFACT] [BUDGET]
(defaults: /root/repo/testdata-sf1 /tmp/verify_sf1 CORRECTNESS_SF1.json 300)
Set SF1_VERIFY_LOG to the Verify stderr capture (default
<VERIFY_OUT>/verify.log) to enable the depth proof.
"""
import glob
import hashlib
import json
import multiprocessing as mp
import os
import queue as queue_mod
import re
import sys
import time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
ARTIFACT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SF1.json"
BUDGET_S = int(sys.argv[4]) if len(sys.argv) > 4 else 300
VERIFY_LOG = os.environ.get("SF1_VERIFY_LOG", f"{OUT}/verify.log")

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Known compute-heavy mirrors (unrolled triangle recounts, per-char
# rolling hashes over the full corpus): DuckDB needs minutes where
# Spark needs seconds. The budget is the ORACLE's, not the engine's —
# raising it here costs sweep wall-clock, nothing else.
BUDGET_OVERRIDE = {
    "dedup_cdc_chunks": 900,
    "text_cdc_chunks": 900,
    "dedup_repeated_spans": 900,
    # 600 through r17; the r18 planted docs pushed the WITH RECURSIVE
    # closure mirror just over it (measured timeout at 600)
    "dedup_cluster_cc": 1200,
    # the auto variant's oracle mirrors the LSH routing at sf>=0.1:
    # 128 minhashes per doc in SQL plus four banded equi-joins
    "dedup_cluster_cc_auto": 900,
    "dedup_component_size_hist": 600,
    "graph_ktruss": 900,
    "graph_truss_decomposition": 1200,
}

# Row-count threshold above which the compare switches from the exact
# pandas diff to the in-database fingerprint (either side exceeding it
# switches both).
PANDAS_LIMIT = 2_000_000

# Unrolled-peel oracles and the fixpoint depths their SQL hardcodes:
# (log kind, log param) -> max rounds the unroll covers. The Spark
# operators print "[kcore] k=K fixpoint after R rounds" /
# "[ktruss] minSupport=M fixpoint after R rounds"; the oracle is only
# sound when every measured R fits its unroll.
UNROLL = {
    "graph_kcore": [("kcore", "k=3", 3)],
    "graph_core_decomposition": [
        ("kcore", "k=1@core", 3), ("kcore", "k=2@core", 7),
        ("kcore", "k=3@core", 16), ("kcore", "k=4@core", 8),
        ("kcore", "k=5@core", 6), ("kcore", "k=6@core", 6),
        ("kcore", "k=7@core", 6), ("kcore", "k=8@core", 6)],
    "graph_ktruss": [("ktruss", "minSupport=2", 6)],
    "graph_truss_decomposition": [
        ("ktruss", "minSupport=1", 6), ("ktruss", "minSupport=2", 6),
        ("ktruss", "minSupport=3", 4), ("ktruss", "minSupport=4", 4)],
}


def measured_depths(log_path):
    """(kind, param) -> (max rounds, min fixpoint edge count) seen in
    the Verify stderr log, or None when the log is unavailable (callers
    then skip, not trust)."""
    if not os.path.exists(log_path):
        return None
    depths = {}
    pat = re.compile(
        r"\[(kcore|ktruss)\] (\S+) fixpoint after (\d+) rounds, (\d+) edges")
    with open(log_path, errors="replace") as f:
        for line in f:
            m = pat.search(line)
            if m:
                key = (m.group(1), m.group(2))
                r, e = int(m.group(3)), int(m.group(4))
                # LAST line per key wins: the sweep workflow appends
                # solo reruns (2>>) after the parallel pass, and a log
                # that accumulated older runs would otherwise
                # contaminate the current run's depths (an old
                # smaller-SF 0-edge fixpoint grants vacuous coverage;
                # an old deeper run masks a regression in unroll
                # coverage). The newest measurement for each
                # (kind, param) is the one this sweep actually ran.
                depths[key] = (r, e)
    return depths


def depth_skips(log_path):
    """Oracle names whose unroll cannot be proven to cover the measured
    sf1 peel depth (absent log lines count as unproven)."""
    depths = measured_depths(log_path)
    skips = {}
    for name, needs in UNROLL.items():
        if depths is None:
            skips[name] = ("skipped: no Verify log to prove peel depth "
                           f"fits the oracle unroll (SF1_VERIFY_LOG={log_path})")
            continue
        emptied = False  # a 0-edge fixpoint makes every later level a no-op
        for kind, param, unroll in needs:
            got = depths.get((kind, param))
            if got is None:
                if emptied:
                    continue  # level never ran: vacuously covered
                skips[name] = (f"skipped: [{kind}] {param} depth line absent "
                               "from Verify log; unroll coverage unproven")
                break
            rounds, edges = got
            if rounds > unroll:
                skips[name] = (f"skipped: measured [{kind}] {param} depth "
                               f"{rounds} exceeds the oracle's {unroll}-round "
                               "unroll (tuned at the sf0.01 gate)")
                break
            if edges == 0:
                emptied = True
    return skips


def compare_one(name, sql, files, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; GenSf's sf1 upsample
        # writes Spark-style directories of part files
        p = f"{SF}/{t}.parquet"
        if not os.path.exists(p):
            # partial SF dirs are legitimate for subset sweeps (the
            # sf10 dir carries only the tables its heavy probes read);
            # an oracle that actually needs the missing table then
            # fails ITS OWN row with a readable error instead of
            # wedging every row at view-creation time
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    try:
        # materialize each side exactly once; every later step (count,
        # schema, pandas diff or fingerprint) reads the temp tables
        con.sql(f"CREATE TEMP TABLE g AS SELECT * FROM read_parquet({files!r})")
        con.sql(f"CREATE TEMP TABLE w AS {sql}")
    except Exception as e:
        q.put({"err": f"SQL ERROR: {str(e)[:200]}"})
        return

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        if len(df):
            df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df

    n_g = con.sql("SELECT count(*) FROM g").fetchone()[0]
    n_w = con.sql("SELECT count(*) FROM w").fetchone()[0]
    res = {"spark_rows": n_g, "oracle_rows": n_w,
           "rows_match": n_g == n_w, "err": None}

    if max(n_g, n_w) <= PANDAS_LIMIT:
        # the exact tools/check.py semantics (sorted-column reindex,
        # full-frame sort, pandas dtype compare, DataFrame.equals)
        g, w = norm(con.sql("SELECT * FROM g").df()), \
               norm(con.sql("SELECT * FROM w").df())
        res["schema_match"] = (list(g.columns) == list(w.columns)
            and [str(t) for t in g.dtypes] == [str(t) for t in w.dtypes])
        res["hash_match"] = (res["rows_match"] and res["schema_match"]
                             and g.equals(w))
        q.put(res)
        return

    # fingerprint path: schema at the DuckDB level (name-sorted
    # name/type pairs), values as count + order-independent sum of
    # per-row hashes. Doubles are zero-normalized (-0.0 -> 0.0) to
    # match pandas equals' tolerance for signed zero; everything in
    # the catalog is engineered bit-exact across engines, so hash
    # equality is the same claim DataFrame.equals makes, minus the
    # row-order sensitivity neither side has (both get sorted).
    def schema_of(tbl):
        return sorted((r[0], r[1])
                      for r in con.sql(f"DESCRIBE {tbl}").fetchall())

    sch_g, sch_w = schema_of("g"), schema_of("w")
    res["schema_match"] = sch_g == sch_w
    if not res["schema_match"]:
        res["hash_match"] = False
        res["err"] = f"fingerprint schema diff: spark={sch_g} oracle={sch_w}"
        q.put(res)
        return

    def fingerprint(tbl):
        parts = []
        for i, (cname, ctype) in enumerate(schema_of(tbl)):
            ref = f'"{cname}"'
            if ctype in ("DOUBLE", "FLOAT", "REAL"):
                ref = f"(CASE WHEN {ref} = 0 THEN CAST(0 AS {ctype}) ELSE {ref} END)"
            parts.append(f"c{i} := {ref}")
        expr = f"hash(struct_pack({', '.join(parts)}))"
        return con.sql(
            f"SELECT COALESCE(CAST(sum(CAST({expr} AS HUGEINT)) AS VARCHAR),"
            f" '0') FROM {tbl}").fetchone()[0]

    res["hash_match"] = (res["rows_match"]
                         and fingerprint("g") == fingerprint("w"))
    res["compare"] = "fingerprint"
    q.put(res)


def main():
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    skips = depth_skips(VERIFY_LOG)
    sha = {k: hashlib.sha256(v.encode()).hexdigest()[:16]
           for k, v in oracle.items()}
    # resume: keep prior green/skip rows — but ONLY when the oracle SQL
    # they were checked against is unchanged (sql_sha match; a row or
    # oracle WITHOUT a sha never matches — None == None once republished
    # 257 stale rows after a subset Verify run clobbered the oracle
    # file); flush after every query so a killed run leaves a usable
    # artifact
    results = {}
    if os.path.exists(ARTIFACT):
        prior = json.load(open(ARTIFACT))
        results = {k: v for k, v in prior.items()
                   if (v.get("hash_match")
                       or (v.get("err") or "").startswith(
                           ("skipped", "oracle_timeout")))
                   and v.get("sql_sha") is not None
                   and v.get("sql_sha") == sha.get(k)}
    # Verify mechanically excludes these at sf >= 0.1 (exact-but-
    # quadratic variants whose documented pipeline path is the capped
    # form) — an absent output for them is the documented skip, not a
    # missing-dump red. Mirrors graft.Verify.quadraticExact.
    quadratic_excluded = {"graph_common_neighbors"}
    # Measured-fence skips (Verify census artifact; absent in older
    # output dirs): name -> reason with the measured candidate counts.
    try:
        fenced = json.load(open(f"{OUT}/fenced.json"))
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        fenced = {}
    # Verify's OWN record of what it tried to dump (attempted.json,
    # written before any query launches, since r11) is the
    # authoritative skip criterion — it already encodes the subset and
    # quadratic-exclusion logic, so this side can't disagree with
    # Verify about whether an absent output is a documented exclusion
    # or a crash (re-deriving the SF from the path did disagree: a
    # trailing slash made Verify parse sf=0 and RUN the quadratic
    # variant while the old rule here still recorded the skip).
    try:
        attempted = set(json.load(open(f"{OUT}/attempted.json")))
    except FileNotFoundError:
        attempted = None
    except (json.JSONDecodeError, OSError) as e:
        # a corrupt/truncated attempted.json silently downgrading crash
        # detection to the legacy sf-parse heuristic must leave a trace
        # (mirrors tools/check.py)
        print(f"WARN: {OUT}/attempted.json unreadable ({e}); falling "
              "back to the legacy sf-parse skip heuristic", flush=True)
        attempted = None
    # legacy fallback for output dirs without attempted.json: the old
    # trailing-sf<number> parse, same shape graft.Verify applies
    m_sf = re.search(r"sf([0-9.]+)/?$", SF)
    sweep_sf = float(m_sf.group(1)) if m_sf else 0.0
    for name in sorted(oracle):
        if name in results:
            continue
        files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
        if not files:
            skip_reason = None
            if name in fenced:
                # measured quadratic fence: Verify ran the row's own
                # census and it crossed the candidate gate; the reason
                # carries the measured numbers
                skip_reason = "skipped: " + fenced[name]
            elif attempted is not None and name not in attempted:
                skip_reason = (
                    "skipped: excluded by this Verify run "
                    "(attempted.json; quadratic-exact variant — see the "
                    "capped sibling's own row)"
                    if name in quadratic_excluded
                    else "skipped: not attempted by this Verify run "
                         "(subset)")
            elif (attempted is None and name in quadratic_excluded
                  and sweep_sf >= 0.1):
                skip_reason = ("skipped: exact-but-quadratic variant, "
                               "mechanically excluded at sf>=0.1 "
                               "(Verify.quadraticExact; no "
                               "attempted.json in this output dir)")
            if skip_reason is not None:
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None, "err": skip_reason,
                    "sql_sha": sha[name]}
                print(f"  SKIP {name}: {skip_reason}", flush=True)
                json.dump(results, open(ARTIFACT, "w"), indent=2)
                continue
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0,
                             "oracle_rows": 0, "err": "NO SPARK OUTPUT",
                             "sql_sha": sha[name]}
            print(f"  MISS {name} (no spark output)", flush=True)
            continue
        if name in skips:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": skips[name],
                             "sql_sha": sha[name]}
            print(f"  SKIP {name}: {skips[name]}", flush=True)
            json.dump(results, open(ARTIFACT, "w"), indent=2)
            continue
        budget = BUDGET_OVERRIDE.get(name, BUDGET_S)
        q = mp.Queue()
        p = mp.Process(target=compare_one, args=(name, oracle[name], files, q))
        t0 = time.monotonic()
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"oracle_timeout>{budget}s",
                             "sql_sha": sha[name]}
            print(f"  TIME {name} (oracle exceeded {budget}s)", flush=True)
            json.dump(results, open(ARTIFACT, "w"), indent=2)
            continue
        # the child's queue feeder thread may still be flushing right
        # after join() — q.empty() races it (a successful compare would
        # be misread as a dead worker), so block with a short timeout
        try:
            res = q.get(timeout=15)
        except queue_mod.Empty:
            res = {"err": "worker died"}
        res.setdefault("rows_match", False)
        res.setdefault("schema_match", False)
        res.setdefault("hash_match", False)
        res.setdefault("spark_rows", None)
        res.setdefault("oracle_rows", None)
        res.setdefault("err", None)
        res["sql_sha"] = sha[name]
        # elapsed-vs-budget stamp (r16 verdict item 5): a row that
        # verifies NEAR its budget on this host is one slower VM away
        # from a timeout — with the ratio in the artifact, a future
        # re-skip is a documented band decision, not a surprise red.
        # Policy (PLANS.md): elapsed/budget > 0.8 means the next sweep
        # on a slower host may legitimately record oracle_timeout;
        # anything under 0.5 timing out instead signals a real change.
        res["elapsed_s"] = round(time.monotonic() - t0, 1)
        res["budget_s"] = budget
        results[name] = res
        print(f"  ok   {name}" if res["hash_match"]
              else f"  FAIL {name}: {res}", flush=True)
        json.dump(results, open(ARTIFACT, "w"), indent=2)
    # The quadratic-exact skip message points at the capped sibling as
    # the production evidence — so VERIFY the sibling is actually green
    # in this sweep before letting the claim stand. A skip whose
    # justification is red (or absent) is itself a red.
    SIBLING = {"graph_common_neighbors": "graph_common_neighbors_capped"}
    for name, sib in SIBLING.items():
        row = results.get(name)
        if not row or not (row.get("err") or "").startswith("skipped"):
            continue
        sib_row = results.get(sib)
        if sib_row and sib_row.get("hash_match"):
            # idempotent under sweep resumes: each resume re-runs this
            # block over the merged artifact, so append the note once
            note = f" [sibling {sib} verified green this sweep]"
            if note not in row["err"]:
                row["err"] += note
        else:
            state = ("absent" if not sib_row
                     else sib_row.get("err") or "hash mismatch")
            row["err"] = None
            row["hash_match"] = False
            row["rows_match"] = False
            row["schema_match"] = False
            row["err"] = (f"SKIP INVALID: capped sibling {sib} not green "
                          f"this sweep ({state})")
            print(f"  FAIL {name}: {row['err']}", flush=True)
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
