package graft

import graft.operators.{Curation, Dedup, TextOps}
import org.apache.spark.sql.{functions => F}

/** Wave-6 corpus-refinement operators (SURVEY §2 E28–E32) on
  * constructed frames with hand-computable answers. */
class RefineSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  // ------------------------------------------------------------ lineDedup
  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("lineDedup: boilerplate line removed, unique lines kept in order") {
    val footer = "shared footer"
    val d = docsOf(
      1L -> s"alpha one\nbeta two\n$footer",
      2L -> s"gamma three\n$footer",
      3L -> s"delta four\n$footer",
      4L -> "unique only")
    val r = Dedup.lineDedup(d, "doc_id", "text", maxDocFreq = 2)
      .orderBy("doc_id").collect()
    // footer df=3 > 2 → removed everywhere; order of survivors preserved
    assert(r(0).getAs[String]("clean_text") == "alpha one\nbeta two")
    assert(r(0).getAs[Long]("n_lines") == 3 && r(0).getAs[Long]("n_kept") == 2)
    assert(r(1).getAs[String]("clean_text") == "gamma three")
    assert(r(3).getAs[String]("clean_text") == "unique only")
    assert(r(3).getAs[Double]("removed_frac") == 0.0)
  }

  test("lineDedup: doc whose every line is boilerplate survives as empty") {
    val d = docsOf(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "x\ny")
    val r = Dedup.lineDedup(d, "doc_id", "text", maxDocFreq = 3)
      .orderBy("doc_id").collect()
    // "x" df=4 > 3 → removed; doc 1 keeps its ROW with empty clean text
    assert(r.length == 4)
    assert(r(0).getAs[String]("clean_text") == "" &&
      r(0).getAs[Long]("n_kept") == 0L &&
      r(0).getAs[Double]("removed_frac") == 1.0)
    assert(r(3).getAs[String]("clean_text") == "y")
  }

  test("lineDedup: repeats WITHIN one doc count that doc once toward df") {
    val d = docsOf(1L -> "x\nx\nx", 2L -> "y")
    val r = Dedup.lineDedup(d, "doc_id", "text", maxDocFreq = 1)
      .orderBy("doc_id").collect()
    // x appears in ONE distinct doc → df=1 ≤ 1 → kept (all three copies)
    assert(r(0).getAs[String]("clean_text") == "x\nx\nx")
  }

  // ------------------------------------------------------ tfidfCosinePairs
  test("tfidfCosinePairs: identical docs score 1.0; disjoint docs absent") {
    // filler docs push N to 8 so df=2 terms get idf ⌊log₂8⌋−⌊log₂2⌋ = 2
    // (at N=3 the integer idf of a df=2 term is 1−1=0 — weightless)
    val filler = (4L to 8L).map(i => i -> s"filler${i}a filler${i}b filler${i}c")
    val d = docsOf(Seq(
      1L -> "apple banana cherry",
      2L -> "apple banana cherry",
      3L -> "dog elephant fox") ++ filler: _*)
    val r = Dedup.tfidfCosinePairs(d, "doc_id", "text", minCosine = 0.1)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("doc_a") == 1L && r(0).getAs[Long]("doc_b") == 2L)
    assert(r(0).getAs[Double]("cosine") == 1.0)
  }

  test("tfidfCosinePairs: df cap drops corpus-wide terms from the index") {
    // "common" is in all 4 docs; with cap=3 it can't pair anything
    val d = docsOf(
      1L -> "common alpha", 2L -> "common beta",
      3L -> "common gamma", 4L -> "common delta")
    val capped = Dedup.tfidfCosinePairs(d, "doc_id", "text",
      minCosine = 0.01, maxDocFreq = 3)
    assert(capped.count() == 0)
  }

  // ------------------------------------------------------------ sampleGroup
  test("sampleGroup: k per group, rank ascending in hash, deterministic") {
    import spark.implicits._
    val d = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("doc_id", "source")
    val r1 = Curation.sampleGroup(d, "doc_id", "source", k = 5)
      .orderBy("source", "sample_rank").collect()
    val r2 = Curation.sampleGroup(d, "doc_id", "source", k = 5)
      .orderBy("source", "sample_rank").collect()
    assert(r1.toSeq == r2.toSeq) // rerun-stable
    assert(r1.length == 10)
    val even = r1.filter(_.getAs[String]("source") == "even")
    assert(even.forall(_.getAs[Long]("n_total") == 20L))
    val hs = even.map(_.getAs[Long]("h")).toSeq
    assert(hs == hs.sorted) // rank order == hash order
  }

  test("sampleGroup: group smaller than k returns the whole group") {
    import spark.implicits._
    val d = Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "source")
    val r = Curation.sampleGroup(d, "doc_id", "source", k = 10)
    assert(r.count() == 2)
  }

  // ---------------------------------------------------- contaminationFuzzy
  test("contaminationFuzzy: verbatim copy flagged at 1.0, unrelated not hit") {
    val evalDoc = "which planet is largest in the solar system today " * 2
    val corpus = docsOf(
      1L -> evalDoc,                    // verbatim leak
      2L -> ("totally different words about cooking pasta dinner " * 2))
    val bench = docsOf(100L -> evalDoc)
    val r = Curation.contaminationFuzzy(corpus, bench, "doc_id", "text")
      .collect()
    assert(r.length == 1) // doc 2 never shares a band bucket
    assert(r(0).getAs[Long]("doc_id") == 1L &&
      r(0).getAs[Long]("bench_id") == 100L &&
      r(0).getAs[Double]("est_jaccard") == 1.0 &&
      r(0).getAs[Long]("contaminated") == 1L)
  }

  test("contaminationFuzzy: near-copy estimates high jaccard") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearCopy = base + " extra tail words"
    val corpus = docsOf(1L -> nearCopy)
    val bench = docsOf(100L -> base)
    val r = Curation.contaminationFuzzy(corpus, bench, "doc_id", "text")
      .collect()
    assert(r.length == 1 && r(0).getAs[Double]("est_jaccard") >= 0.5)
  }

  // -------------------------------------------------------------- zipfSlope
  test("zipfSlope: geometric frequencies give slope −1 exactly") {
    import spark.implicits._
    // term i repeated 2^(8−i) times → floor-log2 freq falls 1 per rank
    // doubling; over ranks 1,2,4 with x=0,1,2 the fit is exact
    val words = Seq("a" -> 256, "b" -> 128, "c" -> 64, "d" -> 32)
      .flatMap { case (w, n) => Seq.fill(n)(w) }
    val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextOps.zipfSlope(d, "text", topV = 4).collect()(0)
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(r.getAs[Double]("zipf_slope") < 0) // decreasing
  }

  test("zipfSlope: single-term corpus yields null slope (degenerate fit)") {
    import spark.implicits._
    val d = Seq((1L, "same same same")).toDF("doc_id", "text")
    val r = TextOps.zipfSlope(d, "text", topV = 10).collect()(0)
    assert(r.getAs[Long]("n_terms") == 1L && r.isNullAt(r.fieldIndex("zipf_slope")))
  }

  // ------------------------------------------------------------------ CDC
  test("cdcSegments: boundaries are content-defined and partition the doc") {
    val d = docsOf(1L -> "alpha beta gamma delta epsilon zeta")
    val segs = d.select(F.explode(
      Dedup.cdcSegments(F.col("text"), p = 2)).as("seg"))
      .collect().map(_.getString(0))
    // segments reassemble to the original token stream
    assert(segs.mkString(" ") == "alpha beta gamma delta epsilon zeta")
    assert(segs.forall(_.nonEmpty))
  }

  test("cdcJaccardPairs: insertion-shifted near-dup still pairs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted preamble words " + base
    val d = docsOf(1L -> base, 2L -> shifted,
      3L -> (1 to 60).map(i => s"other$i").mkString(" "))
    val r = Dedup.cdcJaccardPairs(d, "doc_id", "text", p = 4,
      minJaccard = 0.5).collect()
    // the insertion only disturbs the first segment — the rest of the
    // boundaries are content-defined, so most segments survive verbatim
    assert(r.length == 1)
    assert(r(0).getAs[Long]("doc_a") == 1L && r(0).getAs[Long]("doc_b") == 2L)
    assert(r(0).getAs[Double]("jaccard") >= 0.5)
  }

  test("cdcJaccardPairs: identical docs reach jaccard 1.0") {
    val txt = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docsOf(1L -> txt, 2L -> txt)
    val r = Dedup.cdcJaccardPairs(d, "doc_id", "text", p = 4,
      minJaccard = 0.9).collect()
    assert(r.length == 1 && r(0).getAs[Double]("jaccard") == 1.0)
  }

  // --------------------------------------------------------- empty inputs
  test("every refinement operator handles an empty corpus / graph") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.lineDedup(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.tfidfCosinePairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.cdcJaccardPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Curation.sampleGroup(noDocs, "doc_id", "source", 5).count() == 0)
    assert(Curation.contaminationFuzzy(noDocs, noDocs, "doc_id", "text")
      .count() == 0)
    assert(graft.operators.Graph.pageRank(noPairs, "a", "b").count() == 0)
    // PQ over an empty corpus: empty codebooks, empty codes
    val cb = graft.operators.Pq.codebooks(noVecs, "vec_id", "embedding",
      m = 2, subDim = 4, k = 2, iters = 1)
    assert(cb.count() == 0)
    assert(graft.operators.Pq.encode(noVecs, cb, "vec_id", "embedding",
      m = 2, subDim = 4).count() == 0)
    // zipf over an empty corpus: one degenerate row, null slope
    val z = TextOps.zipfSlope(noDocs, "text").head()
    assert(z.getAs[Long]("n_terms") == 0L &&
      z.isNullAt(z.fieldIndex("zipf_slope")))
  }

  // ------------------------------------------------------------ plan shape
  test("tfidfCosinePairs plan: no cartesian product, join keyed on term") {
    val d = docsOf(1L -> "a b c", 2L -> "b c d")
    val plan = Dedup.tfidfCosinePairs(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("sampleGroup plan: bounded heap aggregate, no window sort") {
    val plan = Curation.sampleGroup(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "source", 10)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("top_k") && !plan.contains("row_number"))
  }

  // ------------------------------------------------------------ binary ANN
  private def vecsOf(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("signPack: bits match a driver-side sign fold, incl. bit 63 and " +
    "zero/negative components") {
    val vs = Seq[(Long, Seq[Float])](
      1L -> (0 until 64).map(i => if (i % 3 == 0) 0.5f else -0.25f),
      2L -> (0 until 64).map(i => if (i == 63) 1f else 0f), // only bit 63
      3L -> (0 until 64).map(_ => 0f)) // all non-positive -> 0L
    val got = graft.operators.Similarity
      .signPack(vecsOf(vs: _*), "vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def fold(v: Seq[Float]): Long =
      v.zipWithIndex.filter(_._1 > 0).map(x => 1L << x._2)
        .foldLeft(0L)(_ | _)
    vs.foreach { case (id, v) =>
      assert(got(id) == fold(v), s"vec $id: ${got(id)} vs ${fold(v)}")
    }
    assert(got(2L) == Long.MinValue) // shiftleft(1, 63) really lands
    assert(got(3L) == 0L)
  }

  test("binaryTopK: hamming equals the structural differing-sign count " +
    "and the rerank is exact cosine over the shortlist") {
    // 4 corpus vectors with known sign patterns; query = vec 0
    def mk(signs: Seq[Int]): Seq[Float] =
      signs.map(s => if (s > 0) 0.7f else -0.7f) ++
        Seq.fill(64 - signs.length)(-0.1f)
    val corpus = vecsOf(
      0L -> mk(Seq(1, 1, 1, 1)), 1L -> mk(Seq(1, 1, 1, -1)),
      2L -> mk(Seq(1, -1, -1, -1)), 3L -> mk(Seq(-1, -1, -1, -1)))
    val codes = graft.operators.Similarity
      .signPack(corpus, "vec_id", "embedding")
    val r = graft.operators.Similarity.binaryTopK(
      corpus, codes, codes.where(F.col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, shortlistK = 3)
      .orderBy("rank").collect()
    // hamming from differing sign bits: vs1=1, vs2=3, vs3=4
    assert(r.map(x => x.getAs[Long]("match_id") ->
      x.getAs[Long]("hamming")).toMap ==
      Map(1L -> 1L, 2L -> 3L, 3L -> 4L))
    // rerank order = exact cosine order (1 closest, then 2, then 3)
    assert(r.map(_.getAs[Long]("match_id")).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
  }

  test("binaryTopK: shortlist bound binds — a true neighbor outside the " +
    "hamming shortlist cannot be reranked in") {
    // query 0; vec 9 is cosine-closest but sign-flipped everywhere
    // (max hamming), so a shortlist of 1 must exclude it
    val base = (0 until 64).map(_ => 0.9f)
    val corpus = vecsOf(
      0L -> base,
      5L -> (0 until 64).map(i => if (i < 32) 0.9f else -0.1f),
      9L -> base.map(-_))
    val codes = graft.operators.Similarity
      .signPack(corpus, "vec_id", "embedding")
    val r = graft.operators.Similarity.binaryTopK(
      corpus, codes, codes.where(F.col("vec_id") === 0L),
      "vec_id", "embedding", k = 2, shortlistK = 1)
      .collect()
    assert(r.map(_.getAs[Long]("match_id")).toSeq == Seq(5L))
  }
}
