package graft

import org.apache.spark.sql.{functions => F}

/** Wave-44 governance queries re-derived driver-side on the small SF:
  * the data card from raw collected documents, the temporal-split
  * leakage audit from raw events, the coverage reconciliation from raw
  * key sets. */
class DatacardSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("corpus_datacard metrics match driver-side recomputation") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .select("text", "lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val m = q("corpus_datacard").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_docs") == docs.length)
    assert(m("n_chars") == docs.map(_._1.length.toLong).sum)
    assert(m("n_tokens") ==
      docs.map(_._1.toLowerCase.split(" +", -1).length.toLong).sum)
    assert(m("n_langs") == docs.map(_._2).distinct.length)
    assert(m("n_sources") == docs.map(_._3).distinct.length)
    assert(m("n_distinct_texts") == docs.map(_._1).distinct.length)
    assert(m("dup_docs") == m("n_docs") - m("n_distinct_texts"))
    assert(m("mean_quality_micro") >= 0L &&
      m("mean_quality_micro") <= 1000000L)
  }

  test("time_split_audit equals a driver-side replay") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cutoff = ev.map(_._2).max - 7L * 86400L * 1000000L
    // .values.toSeq BEFORE mapping to pairs: mapping a Map to tuples
    // would rebuild a Map and collapse users with equal counts
    val per = ev.groupBy(_._1).values.toSeq.map { es =>
      (es.count(_._2 < cutoff).toLong, es.count(_._2 >= cutoff).toLong)
    }
    val r = q("time_split_audit").collect().head
    assert(r.getLong(r.fieldIndex("train_events")) == per.map(_._1).sum)
    assert(r.getLong(r.fieldIndex("val_events")) == per.map(_._2).sum)
    assert(r.getLong(r.fieldIndex("train_users")) ==
      per.count(_._1 > 0))
    assert(r.getLong(r.fieldIndex("val_users")) == per.count(_._2 > 0))
    assert(r.getLong(r.fieldIndex("overlap_users")) ==
      per.count(p => p._1 > 0 && p._2 > 0))
    val leak = per.filter(_._1 > 0).map(_._2).sum
    assert(r.getLong(r.fieldIndex("leak_val_events")) == leak)
    assert(r.getLong(r.fieldIndex("leak_ppm")) ==
      (if (per.map(_._2).sum > 0) leak * 1000000L / per.map(_._2).sum
       else 0L))
  }

  test("embed_coverage equals a driver-side key reconciliation") {
    val dk = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
      .select(F.col("vec_id"), F.size(F.col("embedding")).as("dim"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    val ek = emb.map(_._1).toSet
    val r = q("embed_coverage").collect().head
    assert(r.getLong(r.fieldIndex("docs_total")) == dk.size)
    assert(r.getLong(r.fieldIndex("vecs_total")) == emb.length)
    assert(r.getLong(r.fieldIndex("docs_without_vec")) ==
      dk.count(!ek.contains(_)))
    assert(r.getLong(r.fieldIndex("vecs_without_doc")) ==
      ek.count(!dk.contains(_)))
    assert(r.getLong(r.fieldIndex("dim_min")) == emb.map(_._2).min)
    assert(r.getLong(r.fieldIndex("dim_max")) == emb.map(_._2).max)
    assert(r.getLong(r.fieldIndex("bad_dim_vecs")) ==
      emb.count(_._2 != 64L))
  }
}
