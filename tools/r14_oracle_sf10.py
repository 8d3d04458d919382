#!/usr/bin/env python3
"""Staged DuckDB oracle for the r14 winnow queries at derived-sf10 scale — the
r13_oracle_sf10.py discipline (file-backed memory-capped DuckDB, each oracle CTE
materialized, the winnowing selection expressed as the packed-min hash aggregate that
is value-identical to the oracle's row_number window but does not bust the memory cap):

* dedup_winnow_pairs_rel: the SAME doubled-corpus staging as r13's dedup_winnow_pairs,
  plus the relative df cap greatest(4, ceil(N/1e5)) computed from the staged corpus
  count — the tail (rare/nper/shared/containment) is the verbatim oracle SQL.

* dedup_winnow_admit_stream / dedup_winnow_admit_incremental: ONE staging over the
  admission source (all documents ∪ ' graftdup' twins of existing %7==1 docs at
  +2_000_000) — winnowing is per-document, so each query's per-pipeline selection is a
  doc_id RESTRICTION of the combined selection. Membership is pure id arithmetic:
  real docs have doc_id % 1e7 < 2e6 (GenScale copies sit at c·1e7 + orig, orig < 5000;
  plain dirs have orig < 1e6), twins sit at +2e6 within the copy range; existing =
  real ∧ id%5≠0, feed = (real ∧ id%5=0) ∪ twin, waves split feed by id parity (twin
  parity = original parity since 2e6 is even).

Comparison is in-DuckDB multiset equality (EXCEPT ALL both ways), as in r13.

Usage: tools/r14_oracle_sf10.py <sfDir> <engineVerifyOut> [--db path] [--only q1,q2]
"""
import os
import sys
import time

import duckdb

K = 6
W = 4
B = 256
M = 1000000007
DUP_OFFSET = 1000000
COPY_SHIFT = 10000000
TWIN_OFFSET = 2000000
MAX_DF = 4
MIN_SHARED = 2
RARE_DENOM = 100000


def gram_hash_sql():
    acc = "0::BIGINT"
    for t in range(K):
        acc = f"(({acc}) * {B} + ascii(substr(text, (i + {t + 1})::INT, 1))) % {M}"
    return acc


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    dbpath = "target/r14_oracle.duckdb"
    only = None
    args = sys.argv[3:]
    while args:
        if args[0] == "--db":
            dbpath = args[1]; args = args[2:]
        elif args[0] == "--only":
            only = set(args[1].split(",")); args = args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")
    for suffix in ("", ".wal"):
        if os.path.exists(dbpath + suffix):
            os.remove(dbpath + suffix)
    con = duckdb.connect(dbpath)
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    con.execute("PRAGMA memory_limit='48GB'")
    os.makedirs("target/duck_tmp", exist_ok=True)
    con.execute("PRAGMA temp_directory='target/duck_tmp'")

    p = f"{sfdir}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

    def stage(name, sql):
        t0 = time.time()
        con.execute(f"CREATE TABLE {name} AS {sql}")
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"[stage] {name}: {n} rows in {time.time()-t0:.1f}s", flush=True)

    def stage_winnow(prefix, source_sql):
        """The r13 packed-min winnowing staging, parameterized by table prefix so two
        sources can coexist: emits {prefix}sel (doc_id, i, hv) and {prefix}fps."""
        stage(f"{prefix}d", source_sql)
        stage(f"{prefix}g",
              f"SELECT doc_id, text, greatest(length(text) - {K - 1}, 0) AS nh FROM {prefix}d")
        stage(f"{prefix}h",
              f"SELECT doc_id, u.i AS i, u.hv AS hv FROM ("
              f"SELECT doc_id, unnest([{{'i': i, 'hv': {gram_hash_sql()}}} "
              f"for i in range(0, nh)]) AS u FROM {prefix}g)")
        max_nh = con.execute(f"SELECT max(nh) FROM {prefix}g").fetchone()[0]
        if max_nh >= (1 << 20):
            raise SystemExit(f"gram count {max_nh} exceeds the 20-bit position packing")
        pk = 1 << 20
        offs = ", ".join(str(x) for x in range(W))
        stage(f"{prefix}nh", f"SELECT doc_id, nh FROM {prefix}g WHERE nh > 0")
        stage(f"{prefix}sel", f"""
          SELECT DISTINCT doc_id,
            ({pk} - 1) - (minp % {pk}) AS i,
            minp // {pk} AS hv
          FROM (
            SELECT g.doc_id, g.i - t.v AS j,
              min(g.hv * {pk} + ({pk} - 1 - g.i)) AS minp
            FROM {prefix}h g
            CROSS JOIN unnest([{offs}]) AS t(v)
            JOIN {prefix}nh n ON n.doc_id = g.doc_id
            WHERE (n.nh >= {W} AND g.i - t.v BETWEEN 0 AND n.nh - {W})
               OR (n.nh < {W} AND g.i - t.v = 0)
            GROUP BY g.doc_id, g.i - t.v)""")
        stage(f"{prefix}fps", f"SELECT DISTINCT doc_id, hv AS fp FROM {prefix}sel")

    queries = {}

    # ---- relative-rarity pairs: doubled-corpus staging + corpus-count cap ----
    if only is None or "dedup_winnow_pairs_rel" in only:
        stage_winnow("r",
                     f"SELECT doc_id, text FROM documents UNION ALL "
                     f"SELECT doc_id + {DUP_OFFSET}, text || ' graftdup' FROM documents")
        stage("rdfreq", "SELECT fp, count(*) AS df FROM rfps GROUP BY fp")
        stage("rcap",
              f"SELECT greatest({MAX_DF}, (count(*) + {RARE_DENOM - 1}) // {RARE_DENOM}) "
              f"AS cap FROM rd")
        cap = con.execute("SELECT cap FROM rcap").fetchone()[0]
        print(f"[info] relative df cap = {cap}", flush=True)
        stage("rrare",
              "SELECT f.doc_id, f.fp FROM rfps f JOIN rdfreq USING (fp), rcap "
              "WHERE df <= rcap.cap")
        stage("rnper", "SELECT doc_id, count(*) AS n FROM rrare GROUP BY doc_id")
        stage("rshared",
              "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared "
              "FROM rrare a JOIN rrare b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2")
        queries["dedup_winnow_pairs_rel"] = f"""
          SELECT s.doc_a, s.doc_b, cast(s.n_shared AS BIGINT) AS n_shared,
            cast(na.n AS BIGINT) AS n_a, cast(nb.n AS BIGINT) AS n_b
          FROM rshared s JOIN rnper na ON na.doc_id = s.doc_a
            JOIN rnper nb ON nb.doc_id = s.doc_b
          WHERE 5 * s.n_shared >= 4 * least(na.n, nb.n) AND s.n_shared >= {MIN_SHARED}
          ORDER BY doc_a, doc_b"""

    # ---- admission gates: one staging over documents ∪ feed twins ----
    if only is None or only & {"dedup_winnow_admit_stream", "dedup_winnow_admit_incremental"}:
        stage_winnow("m",
                     f"SELECT doc_id, text FROM documents UNION ALL "
                     f"SELECT doc_id + {TWIN_OFFSET}, text || ' graftdup' FROM documents "
                     f"WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1")
        real = f"doc_id % {COPY_SHIFT} < {TWIN_OFFSET}"
        existing = f"({real} AND doc_id % 5 <> 0)"
        feed = f"(NOT {real} OR doc_id % 5 = 0)"
        # per-pipeline restrictions of the combined distinct (doc_id, fp) table
        stage("mexist", f"SELECT doc_id, fp FROM mfps WHERE {existing}")
        stage("mfeed", f"SELECT doc_id, fp FROM mfps WHERE {feed}")
        # ALL feed doc_ids (winnow-less docs must still emit a decision row)
        stage("mfeedd", f"SELECT doc_id FROM md WHERE {feed}")
        stage("medf", "SELECT fp, count(*) AS df FROM mexist GROUP BY fp")

        def decisions(name, docs_tbl, fps_tbl, df_tbl):
            stage(name, f"""
              SELECT d.doc_id,
                CASE WHEN n >= {MIN_SHARED} THEN 'near_dup' ELSE 'admitted' END AS status,
                n AS n_rare_matched
              FROM (
                SELECT d.doc_id, count(CASE WHEN r.fp IS NOT NULL THEN 1 END) AS n
                FROM {docs_tbl} d
                LEFT JOIN {fps_tbl} i ON i.doc_id = d.doc_id
                LEFT JOIN (SELECT fp FROM {df_tbl} WHERE df <= {MAX_DF}) r ON r.fp = i.fp
                GROUP BY d.doc_id) d""")

        # stream gate: whole feed against the frozen existing index
        decisions("mdec_stream", "mfeedd", "mfeed", "medf")
        queries["dedup_winnow_admit_stream"] = (
            "SELECT doc_id, status, cast(n_rare_matched AS BIGINT) AS n_rare_matched "
            "FROM mdec_stream ORDER BY doc_id")

        # incremental gate: wave 1 against existing, fold admitted, wave 2 against folded
        stage("mw1d", "SELECT doc_id FROM mfeedd WHERE doc_id % 2 = 0")
        stage("mw2d", "SELECT doc_id FROM mfeedd WHERE doc_id % 2 <> 0")
        stage("mw1fps", "SELECT f.doc_id, f.fp FROM mfeed f JOIN mw1d USING (doc_id)")
        stage("mw2fps", "SELECT f.doc_id, f.fp FROM mfeed f JOIN mw2d USING (doc_id)")
        decisions("mdec1", "mw1d", "mw1fps", "medf")
        stage("mdelta",
              "SELECT fp, count(*) AS df FROM mw1fps f "
              "JOIN mdec1 d USING (doc_id) WHERE d.status = 'admitted' GROUP BY fp")
        stage("mdf1",
              "SELECT fp, sum(df) AS df FROM "
              "(SELECT * FROM medf UNION ALL SELECT * FROM mdelta) GROUP BY fp")
        decisions("mdec2", "mw2d", "mw2fps", "mdf1")
        queries["dedup_winnow_admit_incremental"] = """
          SELECT doc_id, cast(1 AS BIGINT) AS wave, status,
                 cast(n_rare_matched AS BIGINT) AS n_rare_matched FROM mdec1
          UNION ALL
          SELECT doc_id, cast(2 AS BIGINT) AS wave, status,
                 cast(n_rare_matched AS BIGINT) AS n_rare_matched FROM mdec2
          ORDER BY doc_id"""

    npass = nfail = 0
    for name, sql in queries.items():
        if only and name not in only:
            continue
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            print(f"SKIP {name}: no engine dump at {qdir}", flush=True)
            continue
        t0 = time.time()
        con.execute(f"CREATE OR REPLACE VIEW spark_out AS SELECT * FROM '{qdir}/*.parquet'")
        con.execute(f"CREATE OR REPLACE VIEW duck_out AS {sql}")
        scols = [r[0] for r in con.execute("DESCRIBE spark_out").fetchall()]
        dcols = [r[0] for r in con.execute("DESCRIBE duck_out").fetchall()]
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: SCHEMA spark={sorted(scols)} duck={sorted(dcols)}", flush=True)
            nfail += 1
            continue
        cols = ", ".join(sorted(scols))
        ns = con.execute("SELECT count(*) FROM spark_out").fetchone()[0]
        nd = con.execute("SELECT count(*) FROM duck_out").fetchone()[0]
        if ns != nd:
            print(f"FAIL {name}: ROWS spark={ns} duck={nd}", flush=True)
            nfail += 1
            continue
        diff = con.execute(f"""
          SELECT count(*) FROM (
            (SELECT {cols} FROM spark_out EXCEPT ALL SELECT {cols} FROM duck_out)
            UNION ALL
            (SELECT {cols} FROM duck_out EXCEPT ALL SELECT {cols} FROM spark_out))""").fetchone()[0]
        if diff != 0:
            print(f"FAIL {name}: VALUES {diff} multiset-diff rows", flush=True)
            nfail += 1
        else:
            print(f"PASS {name}: rows={ns} multiset-equal in {time.time()-t0:.1f}s", flush=True)
            npass += 1
    print(f"{npass} pass, {nfail} fail", flush=True)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
