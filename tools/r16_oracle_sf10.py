#!/usr/bin/env python3
"""Staged DuckDB oracle for the r16 queries at derived-sf10 scale.

* dedup_image_admit_stream_incr / dedup_image_admit_persist: the r14 image admission
  hash staging (encode-grid aHash with the non-sampled-row twin perturbation) over the
  FOUR-way incremental population — existing corpus (side 'ex'), fresh arrivals split
  by parity into waves 1/2, +2M twins of existing (parity-preserving), +4000001 twins
  of wave-1 fresh arrivals (odd → wave 2) — then the two-wave fold tail: wave-1
  decisions against the existing-side value index, the admitted wave-1 docs folded in
  (keyed min over index ∪ delta, exactly the engine's mediaAdmitWave fold), wave-2
  decisions against the folded index. One staged SQL serves BOTH queries: the persist
  gate's parquet round-trip is decision-invariant by design.

Comparison is in-DuckDB multiset equality (EXCEPT ALL both ways), as in r13/r14/r15.

Usage: tools/r16_oracle_sf10.py <sfDir> <engineVerifyOut> [--db path] [--only q1,q2]
"""
import itertools
import os
import sys
import time

import duckdb

TWIN_OFFSET = 2000000
FRESH_TWIN_OFFSET = 4000001
ADMIT_HAMMING = 2


def phash_block_sql(blocks):
    widths = [64 // blocks + (1 if m < 64 % blocks else 0) for m in range(blocks)]
    starts = [0]
    for w in widths:
        starts.append(starts[-1] + w)
    out = []
    for m in range(blocks):
        lo, hi = starts[m], starts[m] + widths[m]
        pieces = []
        for b in range(lo // 16, (hi - 1) // 16 + 1):
            b_lo = max(lo, 16 * b) - 16 * b
            b_hi = min(hi, 16 * (b + 1)) - 16 * b
            rsh, w, lsh = 16 - b_hi, b_hi - b_lo, hi - min(hi, 16 * (b + 1))
            core = f"band_{b}" if rsh == 0 else f"(band_{b} // {1 << rsh})"
            masked = f"({core} % {1 << w})"
            pieces.append(masked if lsh == 0 else f"({masked} * {1 << lsh})")
        out.append("(" + " + ".join(pieces) + ")")
    return out, widths


def phash_combo_key_sql(blocks, k):
    blks, widths = phash_block_sql(blocks)
    keys = []
    for c in itertools.combinations(range(blocks), k):
        acc = blks[c[0]]
        for m in c[1:]:
            acc = f"(({acc}) * {1 << widths[m]} + {blks[m]})"
        keys.append(acc)
    return keys


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    dbpath = "target/r16_oracle.duckdb"
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

    for t in ("documents", "embeddings"):
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    def stage(name, sql):
        t0 = time.time()
        con.execute(f"CREATE TABLE {name} AS {sql}")
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"[stage] {name}: {n} rows in {time.time()-t0:.1f}s", flush=True)

    queries = {}

    incr_names = {"dedup_image_admit_stream_incr", "dedup_image_admit_persist"}
    if only is None or only & incr_names:
        idx = "((k // 8) * h // 8) * 8 + (k % 8)"
        byte = f"('0x' || substr(hex(p), 2*({idx}) + 1, 2))::BIGINT"
        pert = ("CASE WHEN pert = 1 AND NOT list_contains("
                "[(j * h) // 8 for j in range(0, 8)], (k // 8) * h // 8) THEN 1 ELSE 0 END")
        band_defs = ",\n".join(
            f"cast(list_sum([CASE WHEN sv[k+1]*64 >= tot THEN (1 << (k - {16*b})) ELSE 0 END "
            f"for k in range({16*b}, {16*(b+1)})]) AS BIGINT) AS band_{b}"
            for b in range(4))
        stage("imhh", f"""
          WITH b AS (SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS len FROM documents),
          c AS (SELECT doc_id, p, len, greatest(len // 8, 1) AS h FROM b),
          m AS (SELECT doc_id, p, len, h, 0 AS pert, 'ex' AS side, 0 AS wave FROM c WHERE doc_id % 5 <> 0
                UNION ALL SELECT doc_id, p, len, h, 0, 'in',
                  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END FROM c WHERE doc_id % 5 = 0
                UNION ALL SELECT doc_id + {TWIN_OFFSET}, p, len, h, 1, 'in',
                  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END FROM c
                  WHERE doc_id % 5 <> 0 AND doc_id % 9 = 2
                UNION ALL SELECT doc_id + {FRESH_TWIN_OFFSET}, p, len, h, 1, 'in', 2 FROM c
                  WHERE doc_id % 10 = 0),
          s AS (SELECT doc_id, side, wave,
            [CASE WHEN {idx} < len THEN ({byte} + {pert}) % 256 ELSE 0 END
             for k in range(0, 64)] AS sv FROM m),
          hb AS (SELECT doc_id, side, wave, list_sum(sv) AS tot, sv FROM s)
          SELECT doc_id, side, wave, {band_defs} FROM hb""")
        stage("imexvals0",
              "SELECT band_0, band_1, band_2, band_3, min(doc_id) AS hid FROM imhh "
              "WHERE side = 'ex' GROUP BY 1, 2, 3, 4")
        ham = " + ".join(f"bit_count(xor(i2.band_{b}, ev.band_{b}))" for b in range(4))

        def wave_decision(w, exvals):
            stage(f"imi{w}",
                  f"SELECT doc_id, band_0, band_1, band_2, band_3 FROM imhh "
                  f"WHERE side = 'in' AND wave = {w}")
            earms = " UNION ALL ".join(
                f"SELECT hid, {ci} AS ci, {expr} AS cv FROM {exvals}"
                for ci, expr in enumerate(phash_combo_key_sql(4, 2)))
            iarms = " UNION ALL ".join(
                f"SELECT doc_id, {ci} AS ci, {expr} AS cv FROM imi{w}"
                for ci, expr in enumerate(phash_combo_key_sql(4, 2)))
            stage(f"ime{w}bands", earms)
            stage(f"imi{w}bands", iarms)
            stage(f"imcand{w}",
                  f"SELECT DISTINCT i.doc_id, e.hid FROM imi{w}bands i "
                  f"JOIN ime{w}bands e ON i.ci = e.ci AND i.cv = e.cv")
            stage(f"imbest{w}", f"""
              SELECT doc_id, hid, ham FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ham, hid) AS rn FROM (
                  SELECT c2.doc_id, c2.hid, cast({ham} AS BIGINT) AS ham
                  FROM imcand{w} c2 JOIN imi{w} i2 ON i2.doc_id = c2.doc_id
                  JOIN {exvals} ev ON ev.hid = c2.hid
                  WHERE {ham} <= {ADMIT_HAMMING})) WHERE rn = 1""")
            stage(f"imdec{w}", f"""
              SELECT i.doc_id, cast({w} AS BIGINT) AS wave,
                CASE WHEN b.hid IS NOT NULL THEN 'near_dup' ELSE 'admitted' END AS status,
                b.hid AS match_hid, b.ham AS ham_dist
              FROM imi{w} i LEFT JOIN imbest{w} b USING (doc_id)""")

        wave_decision(1, "imexvals0")
        # the fold: admitted wave-1 fingerprints join the index at their own doc_id,
        # keyed min keeps the older hid on a value collision (== mediaAdmitWave)
        stage("imexvals1", """
          SELECT band_0, band_1, band_2, band_3, min(hid) AS hid FROM (
            SELECT band_0, band_1, band_2, band_3, hid FROM imexvals0
            UNION ALL
            SELECT i.band_0, i.band_1, i.band_2, i.band_3, i.doc_id AS hid
            FROM imi1 i JOIN imdec1 d ON d.doc_id = i.doc_id AND d.status = 'admitted')
          GROUP BY 1, 2, 3, 4""")
        wave_decision(2, "imexvals1")
        incr_sql = """
          SELECT doc_id, wave, status, match_hid, ham_dist
          FROM (SELECT * FROM imdec1 UNION ALL SELECT * FROM imdec2)"""
        queries["dedup_image_admit_stream_incr"] = incr_sql
        queries["dedup_image_admit_persist"] = incr_sql

    # simsearch_stream_ivfpq_cells (r16, the sf100 serving knee's fix): the registered
    # chain SQL materializes the corpus × cells CROSS JOIN with full list columns in
    # DuckDB (9e7 rows x 512-byte lists at sf10 -> 60+ GB of temp), so stage it NARROW:
    # the same packed-argmax trick the engine uses (dot*2^21 + (mask - cidx), plain MAX,
    # two's-complement & decode), then the probe/ADC/rerank tail over candidate-sized
    # frames only. Semantics identical to the registered oracle by construction.
    ic = "simsearch_stream_ivfpq_cells"
    if only is None or ic in only:
        MASK, BASE = (1 << 21) - 1, 1 << 21
        FEED = "vec_id % 50 = 7"
        stage("icq", """
          SELECT vec_id,
            list_transform(embedding, x -> CAST(trunc(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
          FROM embeddings""")
        stage("iccells", """
          SELECT cid, cvec, crn - 1 AS cidx FROM (
            SELECT vec_id AS cid, qv AS cvec, row_number() OVER (ORDER BY vec_id) AS crn
            FROM icq WHERE vec_id >= 20)
          WHERE crn <= (SELECT GREATEST(8, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))
                        FROM embeddings)""")
        stage("icassign", f"""
          SELECT vec_id, c2.cid AS cell FROM (
            SELECT m.vec_id,
              {MASK} - (max(CAST(list_dot_product(m.qv, c.cvec) AS BIGINT) * {BASE}
                            + ({MASK} - c.cidx)) & {MASK}) AS cidx
            FROM icq m CROSS JOIN iccells c GROUP BY m.vec_id) a
          JOIN iccells c2 USING (cidx)""")
        stage("icprobes", f"""
          SELECT q_id, cid AS p_cell FROM (
            SELECT m.vec_id AS q_id, c.cid,
              row_number() OVER (PARTITION BY m.vec_id
                ORDER BY CAST(list_dot_product(m.qv, c.cvec) AS BIGINT) DESC, c.cid) AS rn
            FROM icq m CROSS JOIN iccells c WHERE m.{FEED})
          WHERE rn <= 2""")
        stage("icsvv", """
          SELECT vec_id, s, sv, CAST(list_dot_product(sv, sv) AS BIGINT) AS svv FROM (
            SELECT vec_id, s, list_slice(qv, s*8 + 1, s*8 + 8) AS sv
            FROM icq, (SELECT unnest(range(8)) AS s) ss)""")
        stage("iccb", """
          SELECT s, CAST(vec_id - 30 AS INT) AS code, sv AS cw, svv AS cc
          FROM icsvv WHERE vec_id BETWEEN 30 AND 33""")
        stage("icenc0", """
          SELECT v.vec_id, v.s, cb.code,
            v.svv - 2 * CAST(list_dot_product(v.sv, cb.cw) AS BIGINT) + cb.cc AS d
          FROM icsvv v JOIN iccb cb ON v.s = cb.s""")
        stage("icenc", """
          SELECT vec_id, s, code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
            FROM icenc0) WHERE rn = 1""")
        stage("iclut", f"SELECT vec_id AS q_id, s, code, d FROM icenc0 WHERE {FEED}")
        # candidates FIRST (query x probed-cell occupancy), then the 8-sub LUT sum —
        # one flat join tree DuckDB cannot reorder into the enc x lut
        # low-selectivity pairing it picked (and hung on) from the nested form
        stage("iccand", """
          SELECT pr.q_id, a.vec_id FROM icassign a
          JOIN icprobes pr ON a.cell = pr.p_cell
          WHERE a.vec_id <> pr.q_id""")
        stage("icadist", """
          SELECT c.q_id, c.vec_id, CAST(sum(lut.d) AS BIGINT) AS adist
          FROM iccand c
          JOIN icenc enc ON enc.vec_id = c.vec_id
          JOIN iclut lut ON lut.q_id = c.q_id AND lut.s = enc.s
            AND lut.code = enc.code
          GROUP BY c.q_id, c.vec_id""")
        stage("icshortl", """
          SELECT q_id, vec_id, adist FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS rnk
            FROM icadist) WHERE rnk <= 30""")
        queries[ic] = """
          WITH qq AS (SELECT vec_id, qv,
              CAST(list_dot_product(qv, qv) AS BIGINT) AS vv FROM icq),
          qs AS (SELECT vec_id AS q_id, qv AS eqv, vv AS evv FROM qq
                 WHERE vec_id % 50 = 7),
          rr AS (SELECT sl.q_id, sl.vec_id, sl.adist,
            q.vv - 2 * CAST(list_dot_product(q.qv, qs.eqv) AS BIGINT) + qs.evv AS d
            FROM icshortl sl JOIN qq q ON sl.vec_id = q.vec_id
            JOIN qs ON sl.q_id = qs.q_id)
          SELECT q_id, rnk, vec_id, d, adist FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d, vec_id) AS rnk
            FROM rr) WHERE rnk <= 10"""

    # simsearch_stream_append (r16, VERDICT r15 #6): the REGISTERED oracle is pure
    # chain SQL that DuckDB runs directly at sf10 (no staging needed) — read it from
    # the engine dump's oracle_sql.json so tool and registry cannot drift
    sa = "simsearch_stream_append"
    if only is None or sa in only:
        import json
        osql_path = os.path.join(outdir, "oracle_sql.json")
        if os.path.exists(osql_path):
            queries[sa] = json.load(open(osql_path))[sa]
        else:
            print(f"SKIP {sa}: no oracle_sql.json at {outdir}", flush=True)

    npass = nfail = 0
    for name, sql in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            print(f"SKIP {name}: no engine dump at {qdir}", flush=True)
            continue
        con.execute("DROP VIEW IF EXISTS spark_out")
        con.execute("DROP TABLE IF EXISTS duck_out")
        con.execute(f"CREATE VIEW spark_out AS SELECT * FROM '{qdir}/*.parquet'")
        con.execute(f"CREATE TABLE duck_out AS {sql}")
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
        if diff:
            print(f"FAIL {name}: {diff} multiset-different rows", flush=True)
            nfail += 1
        else:
            print(f"PASS {name}: {ns} rows multiset-equal in {time.time()-t0:.1f}s", flush=True)
            npass += 1
    print(f"{npass} pass / {nfail} fail", flush=True)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
