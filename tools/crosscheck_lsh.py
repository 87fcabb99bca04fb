#!/usr/bin/env python3
"""Cross-validate the LSH dedup pipelines at scales where the all-pairs
DuckDB oracle is impractical (the driver's hash gate runs at sf0.01;
this runs at any SF in minutes, not hours).

Usage: python3 tools/crosscheck_lsh.py <sfDir> <verifyOutDir>

Checks:
  1. q27 (MinHash-LSH pairs) == q25 (prefix-blocked exact pairs): two
     INDEPENDENT candidate generators must produce the same verified
     pair set at the same threshold family.
  2. q39 (corpus near-dedup survivors) == a DuckDB replay whose
     candidate pairs come from prefix blocking instead of LSH banding
     (recursive-CTE connected components, cluster-min keeper).
  3. q64 (incremental dedup survivors) == the same style of replay with
     prefix-blocked candidates for both the within-batch and the
     cross-corpus stages.

Exit 1 on any disagreement.
"""
import glob, sys
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    bad = 0

    f27 = glob.glob(f"{out_dir}/q27_minhash_dedup/*.parquet")
    f25 = glob.glob(f"{out_dir}/q25_ngram_jaccard/*.parquet")
    diff = con.sql(f"""
      SELECT count(*) FROM (
        (SELECT id_a, id_b FROM read_parquet({f27!r})
         EXCEPT SELECT id_a, id_b FROM read_parquet({f25!r}))
        UNION ALL
        (SELECT id_a, id_b FROM read_parquet({f25!r})
         EXCEPT SELECT id_a, id_b FROM read_parquet({f27!r})))
      """).fetchone()[0]
    n27 = con.sql(f"SELECT count(*) FROM read_parquet({f27!r})").fetchone()[0]
    if diff == 0:
        print(f"OK   q27 == q25 pair sets ({n27} pairs, independent generators)")
    else:
        print(f"FAIL q27 vs q25: {diff} asymmetric pairs")
        bad += 1

    replay = con.sql("""
      WITH RECURSIVE kept AS (
        SELECT d.* FROM documents d
        JOIN (SELECT min(doc_id) AS doc_id FROM documents
              GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) k
        ON d.doc_id = k.doc_id),
      sh AS (
        SELECT doc_id, substr(text, 1, 40) AS blk,
          list_distinct(list_transform(
            generate_series(1, greatest(len(toks) - 2, 1)),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
              FROM kept)
        WHERE len(toks) >= 1),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      r(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
      comp AS (
        SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src)
      SELECT doc_id, source FROM kept
      WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp < id)
      ORDER BY doc_id
      """).fetchall()
    f39 = glob.glob(f"{out_dir}/q39_dedup_corpus_near/*.parquet")
    got = con.sql(
        f"SELECT doc_id, source FROM read_parquet({f39!r}) ORDER BY doc_id"
    ).fetchall()
    if replay == got:
        print(f"OK   q39 survivors == prefix-blocked DuckDB replay ({len(got)} docs)")
    else:
        print(f"FAIL q39: {len(got)} survivors vs {len(replay)} in replay")
        bad += 1

    replay64 = con.sql("""
      WITH RECURSIVE
      half AS (SELECT (max(doc_id) // 2 + 1) AS h FROM documents),
      corpus AS (SELECT d.* FROM documents d, half WHERE d.doc_id < h),
      fresh AS (SELECT d.* FROM documents d, half WHERE d.doc_id >= h),
      kept AS (
        SELECT d.* FROM fresh d
        JOIN (SELECT min(doc_id) AS doc_id FROM fresh
              GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) k2
        ON d.doc_id = k2.doc_id),
      sh AS (
        SELECT doc_id, substr(text, 1, 40) AS blk,
          list_distinct(list_transform(
            generate_series(1, greatest(len(toks) - 2, 1)),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
              FROM kept)
        WHERE len(toks) >= 1),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      r(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
      comp AS (
        SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src),
      survivors AS (
        SELECT * FROM kept
        WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp < id)),
      csh AS (
        SELECT doc_id, substr(text, 1, 40) AS blk,
          list_distinct(list_transform(
            generate_series(1, greatest(len(toks) - 2, 1)),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
              FROM corpus)
        WHERE len(toks) >= 1),
      cross_dup AS (
        SELECT DISTINCT ssh.doc_id
        FROM (SELECT s.doc_id, sh.blk, sh.shingles FROM survivors s
              JOIN sh ON sh.doc_id = s.doc_id) ssh
        JOIN csh ON ssh.blk = csh.blk
          AND CAST(len(list_intersect(ssh.shingles, csh.shingles)) AS DOUBLE) /
            CAST(len(list_distinct(list_concat(ssh.shingles, csh.shingles))) AS DOUBLE) >= 0.5
        UNION
        SELECT s.doc_id FROM survivors s
        WHERE md5(regexp_replace(lower(s.text), '[^a-z0-9]', '', 'g')) IN (
          SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
          FROM corpus))
      SELECT doc_id, source FROM survivors
      WHERE doc_id NOT IN (SELECT doc_id FROM cross_dup)
      ORDER BY doc_id
      """).fetchall()
    f64 = glob.glob(f"{out_dir}/q64_incremental_dedup/*.parquet")
    got64 = con.sql(
        f"SELECT doc_id, source FROM read_parquet({f64!r}) ORDER BY doc_id"
    ).fetchall()
    if replay64 == got64:
        print(f"OK   q64 survivors == prefix-blocked DuckDB replay ({len(got64)} docs)")
    else:
        print(f"FAIL q64: {len(got64)} survivors vs {len(replay64)} in replay")
        bad += 1

    # 4. q119 (leakage-safe split) co-location at scale: its all-pairs
    # oracle is quadratic like q39's, so at sf0.1 validate the
    # PROPERTIES instead, against independent witnesses:
    #   (a) every verified near-dup pair (q27's set, itself
    #       crosschecked against q25 above) shares split_rep AND side;
    #   (b) every exact-fingerprint group (recomputed here) shares
    #       split_rep AND side;
    #   (c) the side assignment is exactly the md5 bucket of the rep.
    f119 = glob.glob(f"{out_dir}/q119_leakage_safe_split/*.parquet")
    straddle = con.sql(f"""
      WITH s AS (SELECT * FROM read_parquet({f119!r})),
      p AS (SELECT id_a, id_b FROM read_parquet({f27!r}))
      SELECT count(*) FROM p
      JOIN s a ON p.id_a = a.doc_id JOIN s b ON p.id_b = b.doc_id
      WHERE a.split_rep <> b.split_rep OR a.split <> b.split
      """).fetchone()[0]
    fp_straddle = con.sql(f"""
      WITH s AS (SELECT * FROM read_parquet({f119!r})),
      fp AS (SELECT doc_id,
               md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
             FROM documents)
      SELECT count(*) FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
      JOIN s sa ON sa.doc_id = a.doc_id JOIN s sb ON sb.doc_id = b.doc_id
      WHERE sa.split_rep <> sb.split_rep OR sa.split <> sb.split
      """).fetchone()[0]
    bad_bucket = con.sql(f"""
      SELECT count(*) FROM read_parquet({f119!r})
      WHERE split <> CASE WHEN CAST(md5_number_upper(CAST(split_rep AS
            VARCHAR)) & 281474976710655 AS BIGINT) % 100 < 90
            THEN 'train' ELSE 'eval' END
      """).fetchone()[0]
    n119 = con.sql(f"SELECT count(*) FROM read_parquet({f119!r})").fetchone()[0]
    if straddle == 0 and fp_straddle == 0 and bad_bucket == 0:
        print(f"OK   q119 co-location: no near-dup pair or exact-dup group "
              f"straddles the split; buckets replay ({n119} docs)")
    else:
        print(f"FAIL q119: {straddle} near-dup pairs / {fp_straddle} "
              f"exact-dup pairs straddle, {bad_bucket} bucket mismatches")
        bad += 1

    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
