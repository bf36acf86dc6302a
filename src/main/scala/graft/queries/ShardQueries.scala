package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-37 inventory (r6): token-budget sharding — the step that turns
  * a curated corpus into ≈equal-token training shards. The global
  * prefix sum over doc order is computed TWO-LEVEL (per-block sums →
  * a metadata-sized block-offset frame → intra-block window), the E47
  * distributed-prefix technique — never a single-partition window over
  * the corpus. */
object ShardQueries {

  // ---------------------------------------------------------------- E65
  /** Token-budget shard assignment: docs in doc_id order, shard k =
    * exclusive-prefix-tokens div B (B = 10 000) — every shard holds
    * ≈B tokens with only boundary docs straddling. Two-level prefix:
    * blocks of 1024 ids aggregate map-side; the block-offset cumsum
    * runs on the blocks frame (corpus/1024 rows) via the DISTRIBUTED
    * prefix sum ([[graft.operators.DistRank.globalCumSum]] — the block
    * frame grows with the corpus, so it must not funnel through one
    * window partition either); the intra-block cumsum window sorts
    * ≤1024 docs per partition. Output: per shard
    * the doc count, exact token total, and id range — the manifest a
    * training run reads. */
  private val tokenShards = QueryDef(
    "token_shards",
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(F.col("doc_id"),
          F.expr("CAST(size(filter(split(lower(text), ' +'), " +
            "x -> x != '')) AS BIGINT)").as("toks"),
          F.expr("doc_id div 1024").as("blk"))
      val blocks = docs.groupBy("blk").agg(F.sum("toks").as("btoks"))
      // the block-offset cumsum itself runs DISTRIBUTED (the blocks
      // frame is corpus/1024 rows — metadata-sized at sf0.1 but still
      // corpus-proportional, so it gets the same prefix-sum treatment
      // as the doc level rather than one unpartitioned window)
      val offsets = graft.operators.DistRank
        .globalCumSum(blocks, "btoks", "bcum", F.col("blk"))
        .select(F.col("blk"),
          (F.col("bcum") - F.col("btoks")).as("boff"))
      val wb = Window.partitionBy("blk").orderBy("doc_id")
      docs
        .withColumn("icum", F.sum("toks").over(wb))
        .join(offsets, "blk")
        .withColumn("excl", F.expr("boff + icum - toks"))
        .withColumn("shard", F.expr("excl div 10000"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("toks").as("tokens"),
          F.min("doc_id").as("first_doc"),
          F.max("doc_id").as("last_doc"))
        .orderBy("shard")
    },
    Some("""
      WITH dk AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(lower(text),
                 ' +'), x -> x != '')) AS BIGINT) AS toks
        FROM documents),
      c AS (
        SELECT doc_id, toks,
               coalesce(sum(toks) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS excl
        FROM dk)
      SELECT CAST(excl // 10000 AS BIGINT) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS tokens,
             CAST(min(doc_id) AS BIGINT) AS first_doc,
             CAST(max(doc_id) AS BIGINT) AS last_doc
      FROM c GROUP BY 1 ORDER BY shard"""))

  val all: Seq[QueryDef] = Seq(tokenShards)
}
