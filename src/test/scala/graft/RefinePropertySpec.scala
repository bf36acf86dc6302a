package graft

import graft.operators.{Curation, Dedup, Graph, TextOps}
import org.apache.spark.sql.{functions => F}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the wave-6/7 refinement operators: structural
  * invariants that must hold for ANY corpus / graph (same offline
  * ScalaCheck sampling bridge as PrepPropertySpec). */
class RefinePropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toSeq
  }

  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta"))
  } yield ws.mkString(" ")

  private def corpus(nDocs: Int, seed: Long) = {
    import spark.implicits._
    samples(genDoc, nDocs, seed).zipWithIndex
      .map { case (t, i) => (i.toLong + 1, t) }.toDF("doc_id", "text")
  }

  test("cdc segments partition the token stream exactly, for any p") {
    import spark.implicits._
    for (seed <- 1L to 3L; p <- Seq(2, 4, 16)) {
      val d = corpus(30, seed)
      val bad = d.select(F.col("doc_id"),
        F.array_join(Dedup.cdcSegments(F.col("text"), p), " ").as("rejoined"),
        F.array_join(TextOps.tokens(F.col("text")), " ").as("orig"))
        .where(F.col("rejoined") =!= F.col("orig"))
      assert(bad.count() == 0, s"seed=$seed p=$p: segments lost/reordered tokens")
    }
  }

  test("lineDedup conserves lines: n_kept <= n_lines, frac consistent, " +
    "kept text is a subsequence of the input") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      // force some cross-doc repeats: half the docs get a shared line
      val d = corpus(20, seed).select(F.col("doc_id"),
        F.concat_ws("\n", F.col("text"),
          F.when(F.pmod(F.col("doc_id"), F.lit(2)) === 0,
            F.lit("shared line")).otherwise(F.col("text"))).as("text"))
      val r = Dedup.lineDedup(d, "doc_id", "text", maxDocFreq = 3)
      val rows = r.join(d, "doc_id")
        .select("doc_id", "n_lines", "n_kept", "clean_text", "removed_frac", "text")
        .collect()
      assert(rows.length == d.count())
      rows.foreach { row =>
        val (nl, nk) = (row.getAs[Long]("n_lines"), row.getAs[Long]("n_kept"))
        assert(nk >= 0 && nk <= nl)
        assert(row.getAs[Double]("removed_frac") ==
          BigDecimal((nl - nk).toDouble / nl)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        // every kept line appears in the source doc (no invented text)
        val src = row.getAs[String]("text").split("\n").toSet
        val kept = row.getAs[String]("clean_text")
        assert(kept.isEmpty || kept.split("\n").forall(src.contains))
      }
    }
  }

  test("tfidf cosine pairs are within [0,1] and symmetric-by-construction") {
    for (seed <- 1L to 3L) {
      val d = corpus(30, seed)
      val r = Dedup.tfidfCosinePairs(d, "doc_id", "text", minCosine = 0.0)
        .collect()
      r.foreach { row =>
        val c = row.getAs[Double]("cosine")
        assert(c >= 0.0 && c <= 1.0, s"cosine out of range: $c")
        assert(row.getAs[Long]("doc_a") < row.getAs[Long]("doc_b"))
      }
    }
  }

  test("pagerank: ranks bounded by [teleport, n*SCALE]; total mass never grows") {
    import spark.implicits._
    val genEdge = for {
      a <- Gen.chooseNum(1L, 12L); b <- Gen.chooseNum(1L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (seed <- 1L to 3L) {
      val edges = samples(genEdge, 20, seed).distinct.toDF("a", "b")
      val n = edges.select(F.explode(F.array(F.col("a"), F.col("b"))))
        .distinct().count()
      val r = Graph.pageRank(edges, "a", "b", iters = 4).collect()
      assert(r.length == n)
      val teleport = 15L * Graph.SCALE / 100L
      r.foreach { row =>
        val fp = row.getAs[Long]("rank_fp")
        assert(fp >= teleport && fp <= n * Graph.SCALE,
          s"rank $fp outside [$teleport, ${n * Graph.SCALE}]")
      }
      // floor-division only ever LOSES mass vs the ideal total n·SCALE
      assert(r.map(_.getAs[Long]("rank_fp")).sum <= n * Graph.SCALE)
    }
  }

  test("sampleGroup is a subset of the group with exactly min(k, |group|) rows") {
    import spark.implicits._
    for (seed <- 1L to 3L; k <- Seq(1, 4, 50)) {
      val d = corpus(40, seed)
        .withColumn("src", F.pmod(F.col("doc_id"), F.lit(3L)).cast("string"))
      val got = Curation.sampleGroup(d, "doc_id", "src", k)
      val sizes = d.groupBy("src").agg(F.count(F.lit(1)).as("n")).collect()
        .map(r => r.getAs[String]("src") -> r.getAs[Long]("n")).toMap
      val bySrc = got.collect().groupBy(_.getAs[String]("src"))
      sizes.foreach { case (src, n) =>
        assert(bySrc(src).length == math.min(k.toLong, n))
        assert(bySrc(src).forall(_.getAs[Long]("n_total") == n))
      }
      // sampled ids exist in their group
      val bad = got.join(d,
        got("doc_id") === d("doc_id") && got("src") === d("src"), "left_anti")
      assert(bad.count() == 0)
    }
  }
}
