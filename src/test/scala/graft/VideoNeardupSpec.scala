package graft

import org.apache.spark.sql.functions._
import graft.operators.DctHash

/** Properties of the F11/F12 video near-dup composition:
  *
  *  - the PLANT (independently of Spark): same-group videos produce
  *    bit-identical pixel grids exactly on scenes neither variant
  *    replaced, and never on replaced scenes;
  *  - cut composition: every selected keyframe position is a planted
  *    scene start (the F10 rule finds no cuts inside ±6-noise scenes);
  *  - detection: every published pair is same-group (the 63-bit
  *    signature space produces no cross-group exact collisions) with
  *    containment arithmetic self-consistent;
  *  - the structural truth theorem: variant 3 replaces scenes 0–2 and
  *    clips have ≤ 3 scenes, so every (·,3) bucket has ZERO true
  *    near-dups while (0,1), (0,2), (1,2) have real ones — and on this
  *    deterministic corpus the detector's recall is exactly 1 where
  *    truth exists.
  */
class VideoNeardupSpec extends SparkSpec {

  private def md = java.security.MessageDigest.getInstance("MD5")

  test("plant: shared scenes are pixel-identical across the group, " +
    "replaced scenes never are") {
    val m = md
    for (g <- Seq(0L, 17L, 123L); s <- 0L until 3L) {
      val anchor = DctHash.videoPx(m, 4 * g, 4 * s) // v = 0 keeps all
      for (v <- 1L until 4L) {
        val other = DctHash.videoPx(m, 4 * g + v, 4 * s)
        if (s >= v)
          assert(anchor.toSeq == other.toSeq,
            s"scene $s must be a pasted copy for variant $v")
        else
          assert(anchor.toSeq != other.toSeq,
            s"scene $s must be variant-$v-unique")
      }
      // and mid-scene frames of shared scenes are copies too
      val a2 = DctHash.videoPx(m, 4 * g, 4 * s + 2)
      val b2 = DctHash.videoPx(m, 4 * g + 1, 4 * s + 2)
      if (s >= 1) assert(a2.toSeq == b2.toSeq)
    }
  }

  test("every selected keyframe lands on a planted scene start") {
    val frames = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        expr("least(12, CAST(ceil(CAST(length(text) AS DOUBLE) / 32) " +
          "AS BIGINT))").as("nf"))
      .where(col("nf") >= 2)
      .select(col("doc_id"), col("nf"),
        explode(expr("sequence(0L, nf - 1)")).as("fi"))
    val sigs = DctHash.videoSigs(frames)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("fi")
    val kfPos = sigs.withColumn("_prev", lag("sig", 1).over(w))
      .where(col("_prev").isNull || expr("bit_count(sig ^ _prev) > 10"))
    assert(kfPos.where(expr("fi % 4 != 0")).count() == 0,
      "a cut fired inside a ±6-noise scene")
    // and at least one multi-scene video produced >1 keyframe
    assert(kfPos.groupBy("doc_id").count().where(col("count") > 1)
      .count() > 0)
  }

  test("detected pairs are same-group with self-consistent containment") {
    val out = SparkEntry.queries("video_neardup")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a / 4 == b / 4, s"cross-group pair ($a, $b)")
      val (n, ka, kb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(3 * n >= math.min(ka, kb))
      assert(r.getLong(5) == n * 1000000L / math.min(ka, kb))
    }
  }

  test("truth theorem: no (x,3) bucket has true near-dups; recall is 1 " +
    "where truth exists on this corpus") {
    val out = SparkEntry.queries("video_neardup_recall")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(5)))).toMap
    for (va <- 0L until 3L)
      assert(out((va, 3L))._1 == 0,
        s"variant 3 replaces every scene a ≤3-scene clip has")
    for (b <- Seq((0L, 1L), (0L, 2L), (1L, 2L))) {
      val (nTrue, recall) = out(b)
      assert(nTrue > 0, s"bucket $b must carry planted truth")
      assert(recall == 1000000L, s"bucket $b recall $recall")
    }
  }
}
