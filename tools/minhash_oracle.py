#!/usr/bin/env python3
"""Staged DuckDB oracle for the MinHash-family queries (r11 verdict #3).

The driver's one-shot oracle SQL for these queries could not finish at the derived
sf10: the monolithic query recomputes the signature pipeline per CTE reference and
holds every intermediate in memory. This tool runs the SAME pipeline staged — each
intermediate lands as a materialized table in a file-backed DuckDB (spillable), and
the cheap closures run over the materialized pairs. The SQL per stage is verbatim
the oracle's (same constants, generated the same way), so this is the identical
oracle, evaluated with a sane execution plan — not a different check.

For dedup_ngram_jaccard the all-pairs-within-(lang, source) oracle is genuinely
quadratic in block size and infeasible at 100x. GenScale-derived dirs are built from
copy-disjoint token spaces (each copy's tokens carry a per-copy suffix), so the block
key can be refined with the copy id (doc_id // 10M) — but ONLY after the script
PROVES the disjointness from the data itself (no token appears in two copies); if
any token crosses copies the refinement is invalid and the script aborts rather than
reporting a weaker oracle. On non-derived dirs every doc is copy 0 and the refined
oracle degenerates to the driver's exact SQL.

Usage: tools/minhash_oracle.py <sfDir> <engineVerifyOut> [--db <path>] [--only q1,q2]
  <engineVerifyOut> is a graft.Verify dump dir (one parquet dir per query).
Prints PASS/FAIL per query (rows + column-sorted value compare, same discipline as
tools/compare.py) plus stage timings.
"""
import sys, os, time, glob
import duckdb
import pandas as pd
import numpy as np

P = 2147483647
NUM_HASHES = 16
BAND_SIZE = 4
NUM_BANDS = NUM_HASHES // BAND_SIZE
DUP_OFFSET = 1000000
COPY_SHIFT = 10000000  # GenScale DocShift
VERIFY_BP = 5000

TOK = r"""list_filter(string_split_regex(trim(text),'\s+'), x -> x <> '')"""
SHINGLE = (
    "list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)
HV32 = "('0x' || substr(md5(shingle), 1, 8))::BIGINT"


def a_coef(i): return 1000003 + 137 * i
def b_coef(i): return 12345 + 1009 * i


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    dbpath = "target/minhash_oracle.duckdb"
    only = None
    args = sys.argv[3:]
    while args:
        if args[0] == "--db":
            dbpath = args[1]; args = args[2:]
        elif args[0] == "--only":
            only = set(args[1].split(",")); args = args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")
    if os.path.exists(dbpath):
        os.remove(dbpath)
    con = duckdb.connect(dbpath)
    con.execute(f"PRAGMA threads={os.cpu_count()}")

    p = f"{sfdir}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

    def stage(name, sql):
        t0 = time.time()
        con.execute(f"CREATE TABLE {name} AS {sql}")
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"[stage] {name}: {n} rows in {time.time()-t0:.1f}s", flush=True)

    # ---- staged signature pipeline (verbatim oracle SQL, materialized) ----
    stage("doubled",
          f"SELECT doc_id, text FROM documents "
          f"UNION ALL SELECT doc_id + {DUP_OFFSET} AS doc_id, text || ' graftdup' AS text FROM documents")
    stage("hashed",
          f"SELECT doc_id, {HV32} AS hv FROM ("
          f"  SELECT doc_id, unnest({SHINGLE}) AS shingle FROM"
          f"  (SELECT doc_id, {TOK} AS toks FROM doubled))")
    mins = ", ".join(f"min(({a_coef(i)}*hv + {b_coef(i)}) % {P}) AS s{i}" for i in range(NUM_HASHES))
    stage("sig", f"SELECT doc_id, {mins} FROM hashed GROUP BY doc_id")
    bandcols = ", ".join(
        "md5(concat_ws(',', " + ", ".join(f"s{i}" for i in range(b*BAND_SIZE, (b+1)*BAND_SIZE)) + f")) AS band_{b}"
        for b in range(NUM_BANDS))
    stage("banded", f"SELECT doc_id, {bandcols} FROM sig")
    stage("bands", " UNION ALL ".join(
        f"SELECT doc_id, {b} AS bi, band_{b} AS bv FROM banded" for b in range(NUM_BANDS)))
    stage("pairs",
          "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
          "JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id")
    # distinct shingle-hash sets + sizes (verify + estimate exact side)
    stage("sh", "SELECT DISTINCT doc_id, hv FROM hashed")
    stage("sz", "SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id")
    stage("inter",
          "SELECT c.doc_a, c.doc_b, count(*) AS i FROM pairs c "
          "JOIN sh sa ON sa.doc_id = c.doc_a "
          "JOIN sh sb ON sb.doc_id = c.doc_b AND sb.hv = sa.hv "
          "GROUP BY c.doc_a, c.doc_b")
    stage("vpairs",
          f"SELECT i.doc_a, i.doc_b FROM inter i "
          f"JOIN sz za ON za.doc_id = i.doc_a JOIN sz zb ON zb.doc_id = i.doc_b "
          f"WHERE i.i * 10000 // (za.n + zb.n - i.i) >= {VERIFY_BP}")

    def closure(pair_table, out):
        stage(out, f"""
          WITH RECURSIVE
          edges AS (SELECT doc_a AS s, doc_b AS d FROM {pair_table}
                    UNION ALL SELECT doc_b, doc_a FROM {pair_table}),
          nodes AS (SELECT DISTINCT s AS id FROM edges),
          reach(id, r) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id)
          SELECT id, min(r) AS label FROM reach GROUP BY id""")

    closure("pairs", "labels_raw")
    closure("vpairs", "labels_ver")
    stage("toks_n",
          f"SELECT doc_id, cast(len({TOK}) AS BIGINT) AS n_toks FROM doubled")

    def canonical(labels):
        return f"""
          WITH j AS (SELECT l.label, t.doc_id, t.n_toks
                     FROM {labels} l JOIN toks_n t ON l.id = t.doc_id),
          ranked AS (SELECT label, doc_id, n_toks,
            row_number() OVER (PARTITION BY label ORDER BY n_toks DESC, doc_id ASC) AS rn FROM j),
          agg AS (SELECT label, cast(count(*) AS BIGINT) AS member_cnt,
            max(n_toks) AS canon_toks FROM j GROUP BY label)
          SELECT a.label, a.member_cnt, r.doc_id AS canon_doc, a.canon_toks
          FROM agg a JOIN ranked r ON a.label = r.label AND r.rn = 1
          ORDER BY a.label"""

    components = """SELECT label, cast(count(*) AS BIGINT) AS member_cnt, max(id) AS max_member
                    FROM {l} GROUP BY label ORDER BY label"""
    agree = " + ".join(f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES))

    # ---- dedup_ngram_jaccard: copy-refined blocks, validity proven from the data ----
    crossing = con.execute(f"""
      SELECT count(*) FROM (
        SELECT tok FROM (
          SELECT DISTINCT doc_id // {COPY_SHIFT} AS cp, unnest(list_distinct({TOK})) AS tok
          FROM documents)
        GROUP BY tok HAVING count(DISTINCT cp) > 1)""").fetchone()[0]
    print(f"[check] tokens appearing in >1 copy: {crossing}", flush=True)
    if crossing != 0:
        raise SystemExit("copy token spaces are NOT disjoint — the copy-refined "
                         "ngram_jaccard oracle would be invalid on this dir; aborting")
    stage("toksd",
          f"SELECT doc_id, lang, source, doc_id // {COPY_SHIFT} AS cp, "
          f"list_distinct({TOK}) AS toks FROM documents")
    ngram_inter = "len(list_filter(a.toks, x -> list_contains(b.toks, x)))"
    ngram_jac = f"cast({ngram_inter} * 10000 // (len(a.toks) + len(b.toks) - {ngram_inter}) AS BIGINT)"

    queries = {
        "dedup_minhash_pairs": "SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b",
        "dedup_components": components.format(l="labels_raw"),
        "dedup_components_incremental": components.format(l="labels_raw"),
        "dedup_components_verified": components.format(l="labels_ver"),
        "dedup_canonical": canonical("labels_raw"),
        "dedup_canonical_verified": canonical("labels_ver"),
        "dedup_minhash_estimate": f"""
          WITH est AS (SELECT p.doc_a, p.doc_b, ({agree}) * 10000 // {NUM_HASHES} AS est_bp
            FROM pairs p JOIN sig sa ON sa.doc_id = p.doc_a JOIN sig sb ON sb.doc_id = p.doc_b),
          fin AS (SELECT e.doc_a, e.doc_b, e.est_bp,
            coalesce(i.i, 0) * 10000 // (ca.n + cb.n - coalesce(i.i, 0)) AS exact_bp
            FROM est e JOIN sz ca ON ca.doc_id = e.doc_a JOIN sz cb ON cb.doc_id = e.doc_b
            LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b)
          SELECT doc_a, doc_b, cast(est_bp AS BIGINT) AS est_bp,
            cast(exact_bp AS BIGINT) AS exact_bp,
            cast(abs(est_bp - exact_bp) AS BIGINT) AS err_bp
          FROM fin ORDER BY doc_a, doc_b""",
        "dedup_ngram_jaccard": f"""
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ngram_jac} AS jac_bp
          FROM toksd a JOIN toksd b
            ON a.cp = b.cp AND a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
          WHERE {ngram_jac} >= 5000
          ORDER BY doc_a, doc_b""",
    }

    npass = nfail = 0
    for name, sql in queries.items():
        if only and name not in only:
            continue
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            print(f"SKIP {name}: no engine dump at {qdir}", flush=True)
            continue
        t0 = time.time()
        duck = con.execute(sql).df()
        spark = pd.read_parquet(qdir)
        a = spark.reindex(sorted(spark.columns), axis=1)
        b = duck.reindex(sorted(duck.columns), axis=1)
        status = None
        if list(a.columns) != list(b.columns):
            status = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            status = f"ROWS-MISMATCH spark={len(a)} duck={len(b)}"
        else:
            a = a.sort_values(list(a.columns)).reset_index(drop=True)
            b = b.sort_values(list(b.columns)).reset_index(drop=True)
            bad = [c for c in a.columns
                   if not (a[c].astype(str) == b[c].astype(str)).all()]
            if bad:
                c = bad[0]
                m = (a[c].astype(str) != b[c].astype(str))
                i = m.idxmax()
                status = f"VALUE-MISMATCH {c}[{i}]: spark={a[c][i]!r} duck={b[c][i]!r}"
        if status is None:
            npass += 1
            print(f"PASS {name}: rows={len(a)} ({time.time()-t0:.1f}s)", flush=True)
        else:
            nfail += 1
            print(f"FAIL {name}: {status}", flush=True)
    print(f"\n{npass} pass, {nfail} fail", flush=True)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
