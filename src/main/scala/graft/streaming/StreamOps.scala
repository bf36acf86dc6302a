package graft.streaming

import graft.schema.GSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Structured-Streaming re-expressions of the validation + pipeline
  * operators. A streaming DataFrame goes through the SAME validator
  * plan as batch (coerce + conjunctive filter are stateless narrow
  * transforms), so one schema definition serves both runtimes — the
  * reference's "define once, validate everywhere" promise, extended to
  * streams.
  */
object StreamOps {

  /** Filter-mode validation of a stream: coercion + one conjunctive
    * predicate. Stateless → any output mode, no watermark needed. */
  def validateStream(stream: DataFrame, schema: GSchema): DataFrame =
    schema.validator.filterValid(stream)

  /** Watermarked tumbling-window counts (the streaming twin of the
    * batch `window_tumbling` query). */
  def tumblingCounts(stream: DataFrame, tsCol: String, window: String,
      watermark: String, keyCol: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(F.window(F.col(tsCol), window), F.col(keyCol))
      .agg(F.count(F.lit(1)).as("n"))
      .select(
        F.col("window.start").as("win_start"),
        F.col(keyCol), F.col("n"))

  /** Stateful streaming exact-dedup: state is bounded by the watermark
    * horizon (dropDuplicates keeps one state entry per key until the
    * event-time watermark passes it). */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)
}
