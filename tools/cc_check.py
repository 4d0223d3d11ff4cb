#!/usr/bin/env python3
"""Linear-memory replay of the connected-components oracles.

The CC oracles express canonicalization as a recursive CTE:

    reach AS (
      SELECT doc_id, doc_id AS label FROM <seed>
      UNION
      SELECT e.dst, r.label FROM reach r JOIN <edges> e ON e.src = r.doc_id
    )  ...  min(label) GROUP BY doc_id

whose UNION-dedup table holds every (doc, reachable-ancestor) pair —
Σ component_size² rows. DuckDB 1.0 cannot spill a recursive CTE, so at
sf1 the minhash band-collision graphs blow the memory limit ("failed to
allocate block" at a 90-105 GB cap) while the ENGINE side — iterative
pointer-jumping with O(E) state — completes fine. This tool replays the
SAME oracle with the same fixpoint but linear memory:

  1. every CTE before `reach` runs VERBATIM (the edge derivation is
     untouched oracle SQL);
  2. the reach fixpoint is computed by ITERATED min-label propagation
     with pointer jumping (CREATE TABLE per round, state = one label per
     doc + the edge list — the exact algorithm the engine runs, and the
     same fixpoint the recursion defines: min label over the connected
     component, seeds keeping their own label when isolated);
  3. the oracle's remaining SQL runs VERBATIM with `reach` replaced by
     the converged labels table;
  4. the result is compared to the Spark dump with the same
     row/schema/9-digit-hash compare as tools/check.py.

Usage: python3 tools/cc_check.py <sfDir> <outDir> <query> [query ...]
"""
import json
import math
import os
import re
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
                vals.append("NaN" if math.isnan(v) else repr(round(v, 9)))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def split_reach(sql):
    """Return (head, anchor_select, edges_name, tail): the SQL before
    `reach AS (`, the anchor SELECT inside it, the edges CTE it joins,
    and the SQL after the matching close-paren."""
    m = re.search(r"reach AS \(", sql)
    if not m:
        raise SystemExit("no reach CTE found")
    start = m.end()
    depth = 1
    i = start
    while depth > 0:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    body = sql[start:i - 1]
    head = sql[:m.start()]
    tail = sql[i:]
    um = re.search(r"\n\s*UNION\s*\n", body)
    anchor = body[:um.start()].strip()
    em = re.search(r"JOIN\s+(\w+)\s+e\s+ON\s+e\.src\s*=\s*r\.doc_id", body)
    if not em:
        raise SystemExit("unrecognized reach recursive arm")
    return head, anchor, em.group(1), tail


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name in names:
        sql = oracles[name]
        con = duckdb.connect()
        con.sql("SET temp_directory = '/tmp/duck_cc_spill'")
        con.sql("SET max_temp_directory_size = '200GB'")
        con.sql("SET memory_limit = "
                f"'{os.environ.get('GRAFT_CHECK_MEM', '90GB')}'")
        if os.environ.get("GRAFT_CHECK_THREADS"):
            con.sql(f"SET threads = {int(os.environ['GRAFT_CHECK_THREADS'])}")
        con.sql("SET preserve_insertion_order = false")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            path = f"{sf_dir}/{t}.parquet"
            if not os.path.exists(path):
                continue
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            if t == "events":
                ty = [r for r in con.sql(
                    f"DESCRIBE SELECT * FROM '{src}'").fetchall()
                    if r[0] == "ts"][0][1]
                if ty == "BIGINT":
                    con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                            f"(make_timestamp(ts // 1000) AS ts) "
                            f"FROM '{src}'")
                    continue
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        head, anchor, edges_name, tail = split_reach(sql)
        # the CTE list before reach, usable as a standalone WITH prefix
        head_ctes = head.rstrip().rstrip(",")
        print(f"[{name}] edges via verbatim oracle CTEs ({edges_name})")
        con.sql("CREATE TABLE __cc_edges AS "
                f"{head_ctes} SELECT src, dst FROM {edges_name}")
        con.sql(f"CREATE TABLE __cc_labels AS {head_ctes} "
                f"SELECT doc_id, label FROM ({anchor}) __a(doc_id, label)")
        n_edges = con.sql(
            "SELECT count(*) FROM __cc_edges").fetchone()[0]
        rounds = 0
        while True:
            rounds += 1
            con.sql("""CREATE OR REPLACE TABLE __cc_next AS
              SELECT doc_id, min(label) AS label FROM (
                SELECT doc_id, label FROM __cc_labels
                UNION ALL
                SELECT e.dst AS doc_id, l.label
                FROM __cc_edges e JOIN __cc_labels l ON l.doc_id = e.src
                UNION ALL
                SELECT l1.doc_id, l2.label
                FROM __cc_labels l1 JOIN __cc_labels l2
                  ON l1.label = l2.doc_id
              ) GROUP BY doc_id""")
            changed = con.sql(
                """SELECT count(*) FROM __cc_next n
                   JOIN __cc_labels l USING (doc_id)
                   WHERE n.label <> l.label""").fetchone()[0]
            grew = con.sql(
                """SELECT count(*) FROM __cc_next n
                   WHERE n.doc_id NOT IN
                     (SELECT doc_id FROM __cc_labels)""").fetchone()[0]
            con.sql("DROP TABLE __cc_labels")
            con.sql("ALTER TABLE __cc_next RENAME TO __cc_labels")
            if changed == 0 and grew == 0:
                break
            if rounds > 64:
                raise SystemExit(f"[{name}] no fixpoint after 64 rounds")
        print(f"[{name}] fixpoint in {rounds} rounds over {n_edges} edges")
        final_sql = (head + "reach AS (SELECT doc_id, label "
                     "FROM __cc_labels)" + tail)
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        want = con.sql(final_sql)
        want_cols = [d[0] for d in want.description]
        want_rows = want.fetchall()
        ok = (sorted(got_cols) == sorted(want_cols) and
              len(got_rows) == len(want_rows) and
              canon(got_rows, got_cols) == canon(want_rows, want_cols))
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({len(got_rows)} rows vs {len(want_rows)}, "
              f"mode=iterative-cc)")
        if not ok:
            n_fail += 1
        con.close()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
