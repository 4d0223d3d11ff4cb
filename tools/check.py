#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Reads the parquet results that graft.Verify dumped to OUT_DIR, runs each
oracle_sql.json entry in DuckDB against the same sf directory, and compares
row count, schema (column names), and a value hash with columns sorted by
name and rows sorted by all columns.

Usage: python3 tools/check.py <sfDir> <outDir> [jsonOut]

With jsonOut, also writes the per-query verdict table in the driver's
CORRECTNESS_r{N}.json format — the round's SELF-RUN correctness artifact
(CORRECTNESS_SELF_r{N}.json), so a driver-side artifact glitch (the empty
CORRECTNESS_r12.json) can never zero a round's canonical record again.
"""
import json
import math
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(round(v, 9)))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    verdicts = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        verdicts[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.sql(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            record(name, False, False, False, None, None, str(e)[:500])
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} duck={sorted(want_cols)}")
            record(name, len(got_rows) == len(want_rows), False, False,
                   len(got_rows), len(want_rows), None)
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} duck={len(want_rows)}")
            record(name, False, True, False,
                   len(got_rows), len(want_rows), None)
            n_fail += 1
            continue
        g, w = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if g != w:
            bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted-rows {bad}")
            for i in bad[:2]:
                print(f"  spark={g[i]}")
                print(f"  duck ={w[i]}")
            record(name, True, True, False,
                   len(got_rows), len(want_rows), None)
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        record(name, True, True, True, len(got_rows), len(want_rows), None)
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(verdicts, f, indent=2)
        print(f"wrote {json_out} ({len(verdicts)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
