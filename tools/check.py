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
import os
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
    # GRAFT_CHECK_ONLY=a,b,c: replay just those oracles (solo re-runs of
    # a memory-heavy recursive oracle, local iteration)
    only = os.environ.get("GRAFT_CHECK_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",")}
        oracles = {k: v for k, v in oracles.items() if k in keep}
    con = duckdb.connect()
    # out-of-core: the big recursive replays (BPE/LM training unrolls)
    # exceed RAM at sf >= 1 without a spill directory
    con.sql("SET temp_directory = '/tmp/duck_check_spill'")
    con.sql("SET max_temp_directory_size = '200GB'")
    con.sql("SET memory_limit = "
            f"'{os.environ.get('GRAFT_CHECK_MEM', '90GB')}'")
    if os.environ.get("GRAFT_CHECK_THREADS"):
        con.sql(f"SET threads = {int(os.environ['GRAFT_CHECK_THREADS'])}")
    con.sql("SET preserve_insertion_order = false")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue  # scaled dirs may carry a table subset (sf10)
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        if t == "events":
            # ScaleData writes ts as raw NANOSECOND longs (the driver's
            # source is TIMESTAMP(NANOS)); mirror Tables.t's nanos->us
            # conversion so INTERVAL arithmetic sees real timestamps
            ty = [r for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}'").fetchall()
                if r[0] == "ts"][0][1]
            if ty == "BIGINT":
                con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")
                continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    verdicts = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err, mode="full"):
        verdicts[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err, "mode": mode,
        }

    n_pass = n_fail = 0

    # Order-independent in-engine multiset check for results too large
    # to canon in Python — one pass per side, no fetchall. Two
    # independent combiners over the per-row hash of the name-sorted,
    # float-rounded row struct: the HUGEINT SUM (order-free, but
    # offsetting per-row differences could cancel) AND the BIT_XOR
    # (order-free, immune to additive cancellation; a sum+xor pair
    # cancelling simultaneously needs engineered collisions, not an
    # engine bug). Verdict rows from this path carry
    # mode:"in-engine-hash" so they are distinguishable from the full
    # sorted-rows compare.
    def agghash(src_sql):
        d = con.sql(f"DESCRIBE SELECT * FROM ({src_sql}) q").fetchall()
        cols = sorted((r[0], r[1]) for r in d)
        exprs = [f'round("{c}", 9)' if t in ("DOUBLE", "FLOAT") else f'"{c}"'
                 for c, t in cols]
        row = f"hash(ROW({', '.join(exprs)}))"
        n, h, x = con.sql(
            f"SELECT CAST(count(*) AS BIGINT), "
            f"CAST(sum(CAST({row} AS HUGEINT)) AS VARCHAR), "
            f"CAST(bit_xor({row}) AS VARCHAR) "
            f"FROM ({src_sql}) q").fetchone()
        return [c for c, _ in cols], n, (h, x)

    BIG = 2_000_000
    for name, sql in sorted(oracles.items()):
        spark_src = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        try:
            n_spark = con.sql(
                f"SELECT count(*) FROM ({spark_src}) q").fetchone()[0]
            if n_spark > BIG:
                gc, gn, gh = agghash(spark_src)
                wc, wn, wh = agghash(sql)
                ok = gc == wc and gn == wn and gh == wh
                if ok:
                    print(f"PASS {name} ({gn} rows, in-engine hash)")
                    record(name, True, True, True, gn, wn, None,
                           mode="in-engine-hash")
                    n_pass += 1
                else:
                    print(f"FAIL {name}: in-engine hash mismatch "
                          f"cols={gc == wc} rows spark={gn} duck={wn} "
                          f"sum/xor={gh == wh}")
                    record(name, gn == wn, gc == wc, False, gn, wn, None,
                           mode="in-engine-hash")
                    n_fail += 1
                continue
            got = con.sql(spark_src)
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
