package graft

import graft.operators.UrlOps
import org.apache.spark.sql.{functions => F}

/** URL normalization pinned against hand-worked RFC-3986 cases, plus
  * the synthetic-URL derivation's structural guarantees. */
class CrawlSpec extends SparkSpec {

  import spark.implicits._

  private def norm(urls: String*): Seq[String] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "raw_url")
    UrlOps.withNormalizedUrl(df, "raw_url")
      .orderBy("doc_id").select("norm_url").as[String].collect().toSeq
  }

  test("normalization: case, www, default port, slash, utm, fragment") {
    assert(norm(
      "HTTP://WWW.Foo.Example.COM:80/a/b/?utm_source=x&ref=1#frag",
      "https://foo.example.com:443/",
      "https://foo.example.com/p/5",
      "http://foo.example.com/p/5/?utm_a=1&utm_b=2",
      "https://www.Foo.example.com/p/5?ref=home&utm_medium=social",
      "http://foo.example.com:8080/x"          // NON-default port kept
    ) == Seq(
      "http://foo.example.com/a/b?ref=1",
      "https://foo.example.com",
      "https://foo.example.com/p/5",
      "http://foo.example.com/p/5",
      "https://foo.example.com/p/5?ref=home",
      "http://foo.example.com:8080/x"))
  }

  test("normalization is idempotent") {
    val messy = Seq(
      "HTTP://WWW.A.B:80/x/?utm_q=1#f", "https://c.d:443/y?k=v&utm_z=9")
    val once = norm(messy: _*)
    assert(norm(once: _*) == once)
  }

  test("synthetic URLs: every messy feature occurs, and dedup groups are real") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source")
    val raw = UrlOps.withSyntheticUrl(docs)
    val urls = raw.select("raw_url").as[String].collect()
    assert(urls.exists(_.startsWith("HTTP://")))
    assert(urls.exists(_.contains("www.")))
    assert(urls.exists(u => u.contains(":80/") || u.contains(":443/")))
    assert(urls.exists(_.contains("utm_source")))
    assert(urls.exists(_.contains("#sec-2")))
    val n = UrlOps.withNormalizedUrl(raw, "raw_url")
    // normalization strictly collapses (some raw forms share a canon)
    val nRaw = n.select(F.countDistinct("raw_url")).head().getLong(0)
    val nNorm = n.select(F.countDistinct("norm_url")).head().getLong(0)
    assert(nNorm < nRaw)
    // canonical URLs never retain the noise
    val bad = n.where(F.col("norm_url").rlike(
      "utm_|#|www\\.|:80(/|$)|:443(/|$)|/$|[A-Z]")).count()
    assert(bad == 0L)
  }

  test("host_policy verdicts are consistent with the published metrics") {
    val rows = SparkEntry.queries("host_policy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getLong(r.fieldIndex("n_docs"))
      val nu = r.getLong(r.fieldIndex("n_urls"))
      assert(nu >= 1L && nu <= nd)
      assert(r.getLong(r.fieldIndex("dup_ppm")) ==
        (nd - nu) * 1000000L / nd)
      val expect =
        if (r.getLong(r.fieldIndex("avg_q_micro")) < 210000L) "drop"
        else if (r.getLong(r.fieldIndex("dup_ppm")) > 400000L)
          "dedup_first"
        else if (r.getLong(r.fieldIndex("share_ppm")) > 20000L)
          "throttle"
        else "keep"
      assert(r.getString(r.fieldIndex("verdict")) == expect)
    }
    // corpus shares cover the table up to per-host floor loss
    val tot = rows.map(_.getLong(rows.head.fieldIndex("share_ppm"))).sum
    assert(tot <= 1000000L && tot > 1000000L - rows.length)
  }
}
