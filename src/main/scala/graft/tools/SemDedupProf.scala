package graft.tools

import graft.operators.{CacheScope, Dedup, Ivf, Similarity}
import org.apache.spark.sql.{functions => F, SparkSession}

/** Stage-by-stage timing of the semantic_dedup composition at a given
  * SF dir — which of (k-means train, assign+persist, within-cluster
  * pairs, connected components) dominates. Usage:
  *   sbt "runMain graft.tools.SemDedupProf /root/testdata/sf0.1"
  */
object SemDedupProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[semprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.queries.Tables.t(spark, sfDir, "embeddings")
    // warmup
    emb.count(); spark.range(100000).selectExpr("sum(id)").count()

    val cents = timed("kmeans train (k=4, iters=2)") {
      Ivf.kmeansCentroids(emb, "vec_id", "embedding", 4, 2)
    }
    val assigned = timed("assign + persist + norms") {
      val a = CacheScope.persist(
        Ivf.assign(emb, cents, "vec_id", "embedding")
          .select(F.col("vec_id"), F.col("centroid_label"))
          .join(emb.select(F.col("vec_id"), F.col("embedding").as("_v"),
            Similarity.norm(F.col("embedding")).as("_n")), "vec_id"))
      a.count(); a
    }
    val pairs = timed("within-cluster pairs (cos >= 0.35), persist+count") {
      val a = assigned.select(F.col("vec_id").as("vec_a"),
        F.col("centroid_label").as("_lbl"), F.col("_v").as("_va"), F.col("_n").as("_na"))
      val b = assigned.select(F.col("vec_id").as("vec_b"),
        F.col("centroid_label").as("_lbl"), F.col("_v").as("_vb"), F.col("_n").as("_nb"))
      val p = CacheScope.persist(a.join(b, "_lbl")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(F.col("vec_a"), F.col("vec_b"),
          F.round(Similarity.dot(F.col("_va"), F.col("_vb"))
            / (F.col("_na") * F.col("_nb")), 6).as("cos"))
        .filter(F.col("cos") >= 0.35))
      println(s"[semprof]   n_pairs = ${p.count()}")
      p
    }
    timed("CC star-contract") {
      Dedup.connectedComponentsStarContract(pairs, "vec_a", "vec_b").count()
    }
    timed("CC propagation") {
      Dedup.connectedComponents(pairs, "vec_a", "vec_b").count()
    }
    CacheScope.release(spark)
    spark.stop()
  }
}
