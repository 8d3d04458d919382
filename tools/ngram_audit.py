#!/usr/bin/env python3
"""Candidate-cardinality audit for dedup_ngram_jaccard (r11 verdict #6: its sf10 bench
ratio was 17.1x per 10x data — worst of the batch heavies — and the question is whether
the prefix-filtered candidate join grows super-linearly or the cost is elsewhere).

For each sf dir, replays the engine's candidate pipeline arithmetic in DuckDB and
reports the driver quantities: docs, (lang, source) blocks, token occurrences, prefix
rows (after the PPJoin prefix filter), DISTINCT candidate pairs, verify-join input rows
(sum over candidates of both docs' token-list lengths) and final output pairs. If
candidates scale ~linearly with the by-construction duplicate structure, the engine's
super-linear wall time is shuffle/sort volume, not candidate blowup.

Usage: tools/ngram_audit.py <sfDir> [<sfDir> ...]
"""
import sys, os, json
import duckdb

TOK = r"""list_filter(string_split_regex(trim(text),'\s+'), x -> x <> '')"""

for sfdir in sys.argv[1:]:
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    p = f"{sfdir}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")
    con.execute(f"""CREATE TABLE d AS
      SELECT doc_id, lang, source, list_distinct({TOK}) AS toks,
             len(list_distinct({TOK})) AS sz FROM documents""")
    con.execute("""CREATE TABLE occ AS
      SELECT doc_id, lang, source, sz, unnest(toks) AS tok FROM d""")
    con.execute("CREATE TABLE dfreq AS SELECT tok, count(*) AS df FROM occ GROUP BY tok")
    # PPJoin prefix for t = 0.5: rare-first (df asc, tok asc) rank <= sz - ceil(sz/2) + 1
    con.execute("""CREATE TABLE prefix AS
      SELECT doc_id, lang, source, tok, sz FROM (
        SELECT o.doc_id, o.lang, o.source, o.tok, o.sz,
               row_number() OVER (PARTITION BY o.doc_id ORDER BY f.df, o.tok) AS rn
        FROM occ o JOIN dfreq f USING (tok))
      WHERE rn <= sz - ceil(sz * 0.5) + 1""")
    con.execute("""CREATE TABLE cand AS
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b
        ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
       AND a.doc_id < b.doc_id AND a.sz <= b.sz * 2 AND b.sz <= a.sz * 2""")
    row = con.execute("""
      SELECT (SELECT count(*) FROM d),
             (SELECT count(*) FROM (SELECT DISTINCT lang, source FROM d)),
             (SELECT count(*) FROM occ),
             (SELECT count(*) FROM prefix),
             (SELECT count(*) FROM cand),
             (SELECT coalesce(sum(da.sz + db.sz), 0) FROM cand c
                JOIN d da ON da.doc_id = c.doc_a JOIN d db ON db.doc_id = c.doc_b),
             (SELECT count(*) FROM cand c
                JOIN d a ON a.doc_id = c.doc_a JOIN d b ON b.doc_id = c.doc_b
               WHERE len(list_filter(a.toks, x -> list_contains(b.toks, x))) * 10000
                     // (a.sz + b.sz - len(list_filter(a.toks, x -> list_contains(b.toks, x)))) >= 5000)
      """).fetchone()
    print(json.dumps({"sf_dir": sfdir, "docs": row[0], "blocks": row[1],
                      "occurrences": row[2], "prefix_rows": row[3],
                      "cand_pairs": row[4], "verify_input_rows": row[5],
                      "output_pairs": row[6]}), flush=True)
    con.close()
