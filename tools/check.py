#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
written by graft.Verify, run the corresponding oracle SQL in DuckDB over
the same parquet tables and compare (rows sorted, columns sorted by name).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [mirrorJsonOut]

When mirrorJsonOut is given, a driver-format per-query mirror is written
there: {"queries": {name: {rows_match, schema_match, hash_match, rows}},
"n_ok", "n_fail", "sf"} — the same field triple the driver's
CORRECTNESS_r<N>.json carries, so the committed local mirror stays
format-compatible with the artifact it mirrors (the r15 driver artifact
came back empty and the mirror was the round's primary record).
"""
import json, math, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Engine-portable oracle types. Anything outside this set (HUGEINT from
# DuckDB's sum(BIGINT), DECIMAL from untyped literals, ...) hashes
# differently than Spark's output even when the values are equal — this
# class of silent drift cost rounds 1 and 3, so fail loudly up front.
PORTABLE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                  "FLOAT", "VARCHAR", "BOOLEAN", "TIMESTAMP", "DATE"}


def type_violations(rel):
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        base = t.split("(")[0].strip()
        while base.endswith("[]"):  # list types: check the element type
            base = base[:-2]
        if base not in PORTABLE_TYPES:
            bad.append(f"{col}:{t}")
    return bad


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main(sf_dir, out_dir, mirror_out=None):
    mirror = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    timings = {}  # per-query oracle seconds: the driver-gate cost profile
    t_all = time.perf_counter()
    for name, sql in sorted(oracle.items()):
        t_q = time.perf_counter()
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = sorted(
                tuple(norm(v) for v in row)
                for row in got.select(*[f'"{c}"' for c in got_cols]).fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            mirror[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "rows": None,
                            "error": f"spark output unreadable: {e}"}
            n_bad += 1
            continue
        try:
            exp = con.sql(sql)
            bad_types = type_violations(exp)
            if bad_types:
                print(f"FAIL {name}: non-portable oracle column types: {bad_types}"
                      " (CAST the final projection to BIGINT/DOUBLE/VARCHAR/...)")
                mirror[name] = {"rows_match": False, "schema_match": False,
                                "hash_match": False, "rows": len(got_rows),
                                "error": f"non-portable types: {bad_types}"}
                n_bad += 1
                continue
            exp_cols = sorted(exp.columns)
            exp_rows = sorted(
                tuple(norm(v) for v in row)
                for row in exp.select(*[f'"{c}"' for c in exp_cols]).fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            mirror[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "rows": len(got_rows),
                            "error": f"oracle sql error: {e}"}
            n_bad += 1
            continue
        timings[name] = round(time.perf_counter() - t_q, 3)
        mirror[name] = {"rows_match": len(got_rows) == len(exp_rows),
                        "schema_match": got_cols == exp_cols,
                        "hash_match": got_rows == exp_rows,
                        "rows": len(got_rows)}
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ\n  spark={got_cols}\n  duck ={exp_cols}")
            n_bad += 1
        elif got_rows != exp_rows:
            diff_a = [r for r in got_rows if r not in set(exp_rows)][:3]
            diff_b = [r for r in exp_rows if r not in set(got_rows)][:3]
            print(f"FAIL {name}: rows differ (spark={len(got_rows)}, duck={len(exp_rows)})")
            print(f"  spark-only: {diff_a}")
            print(f"  duck-only : {diff_b}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got_rows)} rows, {timings[name]:.1f}s)")
            n_ok += 1
    total = time.perf_counter() - t_all
    print(f"\n{n_ok} ok, {n_bad} failed, oracle wall {total:.1f}s")
    # the driver-gate cost profile: when the round's CORRECTNESS artifact
    # comes back empty, THIS is the suspect — the oracle compare expiring
    # the driver's window. Slowest-first so the top offender is line one.
    top = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    print("slowest oracles:")
    for k, v in top:
        print(f"  {v:7.1f}s  {k}")
    if mirror_out:
        json.dump({"sf": sf_dir.rstrip("/").rsplit("/", 1)[-1],
                   "queries": mirror, "n_ok": n_ok, "n_fail": n_bad,
                   "oracle_wall_sec": round(total, 1),
                   "oracle_sec": timings},
                  open(mirror_out, "w"), indent=0, sort_keys=True)
        print(f"mirror written: {mirror_out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
