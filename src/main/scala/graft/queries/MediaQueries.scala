package graft.queries

import graft.operators.CacheScope
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-20 inventory (r6): multimodal payload analysis — the byte-level
  * operators a 100 TB media-curation pipeline runs between ingest and
  * decode. The reference (flycatcher) validates only structured rows;
  * these extend the F-category plumbing (F1 media meta, F3 frame
  * sampling, F4 perceptual hash) with the per-payload statistics passes
  * that decide whether a blob is even worth decoding: entropy screening
  * (compressed/encrypted vs text), PCM window loudness/clipping, and
  * tiled luma statistics.
  *
  * Decode discipline matches F3/F4: the container has no codecs, so the
  * byte-production step is a deterministic md5-chain stub that both
  * engines compute bit-identically; a real deployment swaps exactly
  * that one expression for a codec call (in the F2 batched
  * mapPartitions shape) and keeps every downstream operator unchanged.
  * All arithmetic is integer-exact (micros) except IEEE-deterministic
  * single sqrt/log2 calls rounded to 6dp per SURVEY §5.
  */
object MediaQueries {

  // ---------------------------------------------------------------- F5
  /** Character-distribution Shannon entropy per document — the cheap
    * "is this payload natural text or compressed/encrypted noise"
    * screen every corpus ingest runs before spending decode/tokenize
    * budget. Distributed shape: explode to (doc, symbol) → ONE
    * map-side-combined count shuffle keyed by (doc_id, ch) → per-doc
    * re-aggregate; state is bounded by alphabet×docs, never corpus
    * bytes. Entropy is published in integer micros: each c·log2(c)
    * term is rounded to micros BEFORE the sum (order-independent
    * integer addition — a double Σ would be partition-order dependent),
    * then H = log2(n) − Σ/n in pure int64. */
  private val payloadEntropy = QueryDef(
    "payload_entropy",
    (s, d) => {
      val ch = t(s, d, "documents")
        .where(F.length(F.col("text")) > 0)
        .select(F.col("doc_id"),
          F.explode(F.split(F.col("text"), "")).as("ch"))
        .where(F.col("ch") =!= "") // Spark split("") keeps a trailing ""
      val cnt = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).as("c"))
      cnt.groupBy("doc_id")
        .agg(F.sum("c").as("n"),
          F.count(F.lit(1)).as("distinct_chars"),
          F.expr("sum(CAST(round(c * log2(c) * 1000000) AS BIGINT))")
            .as("s"))
        .select(F.col("doc_id"), F.col("n"), F.col("distinct_chars"),
          F.expr("CAST(round(log2(n) * 1000000) AS BIGINT) - s div n")
            .as("entropy_micro"))
        .orderBy("doc_id")
    },
    Some("""
      WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents WHERE length(text) > 0),
      cnt AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        FROM ch WHERE ch != '' GROUP BY 1, 2),
      agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS distinct_chars,
               CAST(sum(CAST(round(c * log2(c) * 1000000) AS BIGINT))
                    AS BIGINT) AS s
        FROM cnt GROUP BY 1)
      SELECT doc_id, n, distinct_chars,
             CAST(CAST(round(log2(n) * 1000000) AS BIGINT) - s // n
                  AS BIGINT) AS entropy_micro
      FROM agg ORDER BY doc_id"""))

  // ---------------------------------------------------------------- F6
  /** Windowed PCM loudness/clipping audit over audio-like payloads:
    * 4 windows × 16 signed samples per payload, per-window sum of
    * squares (exact int64), RMS (single IEEE-correctly-rounded sqrt,
    * 6dp), and a peak-based clipping flag. The window explode and the
    * per-window lambda aggregation are NARROW (no shuffle at all —
    * whole-stage codegen end to end); only the final orderBy exchanges.
    * Sample decode is the md5-chain stub (see object doc). */
  private val audioRmsWindows = QueryDef(
    "audio_rms_windows",
    (s, d) => {
      // materialize the sample arrays BELOW the lambda consumers
      // (CollapseProject would otherwise inline the md5 transform into
      // every aggregate element_at — the F4 80× pathology)
      val wins = CacheScope.persist(
        t(s, d, "documents").select(F.col("doc_id"), F.expr(
          "transform(sequence(0, 3), w -> transform(sequence(0, 15), " +
            "k -> CAST(conv(substring(md5(concat(text, '|', " +
            "CAST(w AS STRING))), 1 + 2 * k, 2), 16, 10) AS BIGINT) " +
            "- 128))").as("wins")))
      wins
        .select(F.col("doc_id"),
          F.posexplode(F.col("wins")).as(Seq("wi", "samples")))
        .select(F.col("doc_id"), F.col("wi").cast("long").as("window_idx"),
          F.expr("aggregate(samples, 0L, (acc, x) -> acc + x * x)")
            .as("sumsq"),
          F.expr("aggregate(samples, 0L, (acc, x) -> greatest(acc, abs(x)))")
            .as("peak"))
        .withColumn("rms", F.expr("round(sqrt(sumsq / 16.0), 6)"))
        .withColumn("clipped",
          F.expr("CAST(CASE WHEN peak >= 120 THEN 1 ELSE 0 END AS BIGINT)"))
        .orderBy("doc_id", "window_idx")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, text, unnest(generate_series(0, 3)) AS wi
        FROM documents),
      s AS (
        SELECT doc_id, wi,
               list_transform(generate_series(0, 15), k ->
                 CAST(('0x' || substr(md5(text || '|' ||
                        CAST(wi AS VARCHAR)), 1 + 2 * k, 2)) AS BIGINT)
                 - 128) AS samples
        FROM w),
      a AS (
        SELECT doc_id, CAST(wi AS BIGINT) AS window_idx,
               CAST(list_sum(list_transform(samples, x -> x * x))
                    AS BIGINT) AS sumsq,
               CAST(list_max(list_transform(samples, x -> abs(x)))
                    AS BIGINT) AS peak
        FROM s)
      SELECT doc_id, window_idx, sumsq, peak,
             round(sqrt(sumsq / 16.0), 6) AS rms,
             CAST(CASE WHEN peak >= 120 THEN 1 ELSE 0 END AS BIGINT)
               AS clipped
      FROM a ORDER BY doc_id, window_idx"""))

  // ---------------------------------------------------------------- F7
  /** Tiled luma statistics over image-like payloads: decode to the F4
    * 8×8 grid, split into four 4×4 tiles, publish per-tile min/max and
    * exact-micro mean — the thumbnail-level exposure/contrast profile
    * used to route images (dark/blown-out/flat) before full decode.
    * Pure integer arithmetic (mean = sum × 62500 micros, exact); the
    * tile explode is narrow; pixel arrays are materialized once below
    * the three lambda consumers. */
  private val imageTileStats = QueryDef(
    "image_tile_stats",
    (s, d) => {
      val pxf = CacheScope.persist(
        t(s, d, "documents").select(F.col("doc_id"), F.expr(
          "transform(sequence(0, 63), j -> CAST(conv(substring(" +
            "md5(concat(text, '#', CAST(j div 16 AS STRING))), " +
            "1 + 2 * (j % 16), 2), 16, 10) AS BIGINT))").as("px")))
      pxf
        .select(F.col("doc_id"), F.explode(F.expr(
          "transform(sequence(0, 3), t -> named_struct('t', t, " +
            "'tpx', transform(sequence(0, 15), k -> element_at(px, " +
            "CAST((4 * (t div 2) + k div 4) * 8 + 4 * (t % 2) + " +
            "(k % 4) + 1 AS INT)))))")).as("tile"))
        .select(F.col("doc_id"),
          F.col("tile.t").cast("long").as("tile_idx"),
          F.expr("CAST(tile.t div 2 AS BIGINT)").as("tile_r"),
          F.expr("CAST(tile.t % 2 AS BIGINT)").as("tile_c"),
          F.expr("array_min(tile.tpx)").as("px_min"),
          F.expr("array_max(tile.tpx)").as("px_max"),
          F.expr("aggregate(tile.tpx, 0L, (acc, x) -> acc + x) * 62500")
            .as("mean_micro"))
        .orderBy("doc_id", "tile_idx")
    },
    Some("""
      WITH px AS (
        SELECT doc_id,
               list_transform(generate_series(0, 63), j ->
                 CAST(('0x' || substr(md5(text || '#' ||
                        CAST(j // 16 AS VARCHAR)), 1 + 2 * (j % 16), 2))
                      AS BIGINT)) AS px
        FROM documents),
      t AS (
        SELECT doc_id, unnest(generate_series(0, 3)) AS t, px FROM px),
      tp AS (
        SELECT doc_id, t,
               list_transform(generate_series(0, 15), k ->
                 px[(4 * (t // 2) + k // 4) * 8 + 4 * (t % 2) + (k % 4)
                    + 1]) AS tpx
        FROM t)
      SELECT doc_id, CAST(t AS BIGINT) AS tile_idx,
             CAST(t // 2 AS BIGINT) AS tile_r,
             CAST(t % 2 AS BIGINT) AS tile_c,
             CAST(list_min(tpx) AS BIGINT) AS px_min,
             CAST(list_max(tpx) AS BIGINT) AS px_max,
             CAST(list_sum(tpx) * 62500 AS BIGINT) AS mean_micro
      FROM tp ORDER BY doc_id, tile_idx"""))

  val all: Seq[QueryDef] = Seq(payloadEntropy, audioRmsWindows,
    imageTileStats)
}
