package graft.queries

import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-39 inventory (r6): duplication-by-length profile — the "are
  * long documents more or less duplicated" diagnostic that decides
  * whether a dedup pass should be length-stratified. Length buckets
  * are the C66 integer log2 (length(bin(x)) — no float boundary);
  * duplication from the D1 exact-hash groups; all-integer ppm. */
object DupProfileQueries {

  // ---------------------------------------------------------------- D37
  /** Exact-duplicate rate per log2 length bucket: docs, distinct
    * texts (by the portable 60-bit hash, D1's key), and the duplicate
    * share in ppm — one (bucket, hash) aggregate then a bucket-bounded
    * regroup; never a self-join. */
  private val dupByLength = QueryDef(
    "dup_by_length",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(
          F.expr("CAST(length(bin(greatest(n_chars, 1))) AS BIGINT)")
            .as("bucket"),
          graft.operators.Hashing.hash60(F.col("text")).as("h"))
      docs.groupBy("bucket", "h").agg(F.count(F.lit(1)).as("c"))
        .groupBy("bucket")
        .agg(F.expr("CAST(sum(c) AS BIGINT)").as("n_docs"),
          F.count(F.lit(1)).as("n_distinct"),
          F.expr("CAST(sum(c - 1) AS BIGINT)").as("n_dups"),
          F.expr("sum(c - 1) * 1000000 div sum(c)").as("dup_ppm"))
        .orderBy("bucket")
    },
    Some(s"""
      WITH h AS (
        SELECT CAST(length(bin(greatest(n_chars, 1))) AS BIGINT)
                 AS bucket,
               ${graft.operators.Hashing.hash60Sql("text")} AS h
        FROM documents),
      g AS (SELECT bucket, h, CAST(count(*) AS BIGINT) AS c
            FROM h GROUP BY 1, 2)
      SELECT bucket, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c - 1) AS BIGINT) AS n_dups,
             CAST(sum(c - 1) * 1000000 // sum(c) AS BIGINT) AS dup_ppm
      FROM g GROUP BY bucket ORDER BY bucket"""))

  val all: Seq[QueryDef] = Seq(dupByLength)
}
