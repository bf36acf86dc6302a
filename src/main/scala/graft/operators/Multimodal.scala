package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, processed in per-partition
  * batches (the Scala analog of `mapInPandas` batch processing).
  *
  * The actual media decode is STUBBED — this container has no
  * image/audio libraries — behind [[FakeDecoder]], a deterministic fake.
  * Everything Spark-side is real and tested: schema evolution, batch
  * iteration shape, partition-preserving execution, and the narrow
  * (no-shuffle) plan.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB decoder: a real implementation would call the codec here
    * (javax.imageio / ffmpeg bindings). Deterministic on input bytes AND
    * engine-portable: the fake dimensions derive from the md5 content
    * hash (graft.operators.Hashing.hash60 semantics), so a SQL oracle
    * can reproduce them exactly. */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val magic = bytes.take(2).map("%02x".format(_)).mkString
      val format = magic match {
        case "ffd8" => "jpeg"
        case "8950" => "png"
        case _      => "raw"
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      (format, ((h % 640) + 1).toInt, ((h / 640 % 480) + 1).toInt)
    }
  }

  /** Attach decoded metadata to a binary column, processing each
    * partition in `batchSize` chunks (mirrors Pandas-UDF batch shape:
    * amortizes per-batch setup such as model/codec initialization).
    * Narrow transform — no shuffle, schema = input ++ meta struct. */
  def withMediaMeta(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", metaSchema, nullable = true))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (decoder/model init)
        batch.map { row =>
          val meta = Option(row.get(binIdx)).map { b =>
            val bytes = b.asInstanceOf[Array[Byte]]
            val (fmt, w, h) = FakeDecoder.decode(bytes)
            Row(fmt, w, h, bytes.length.toLong)
          }.orNull
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }(enc)
  }

  /** Deterministic frame-sampling plan for video-like payloads: emit
    * every `stride`-th chunk offset as a (frame_idx, offset) row —
    * explode is the real plumbing; decode of each frame is the stub. */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = F.ceil(F.length(F.col(binCol)) / frameBytes / stride).cast("int")
    // empty or NULL payloads have no frames: emit an empty array (the
    // non-outer explode then drops the row) instead of a spurious
    // frame_idx=0
    val idxs = F.when(nFrames > 0, F.sequence(F.lit(0), nFrames - 1))
      .otherwise(F.array().cast("array<int>"))
    df.select(F.col(idCol), F.explode(idxs).as("frame_idx"))
      .withColumn("byte_offset", F.col("frame_idx") * frameBytes * stride)
  }
}
