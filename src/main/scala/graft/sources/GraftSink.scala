package graft.sources

import java.util
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 batch SINK with real commit/abort
  * transactionality — the write half of the connector surface
  * ([[SynthDocs]] is the read half), `df.write.format(
  * "graft.sources.GraftAtomicSinkProvider").option("path", p)`.
  *
  * Visibility is MANIFEST-GATED, the Iceberg/Delta pattern reduced to
  * its transactional core:
  *
  *  - each task writes its rows to `_staging/<queryId>/part-...` and
  *    reports the file in its [[WriterCommitMessage]] — nothing under
  *    `_staging/` is ever readable;
  *  - the driver's JOB commit moves the staged files into `data/` and
  *    then publishes a NEW manifest version `_graft_commit_v<N>.json`
  *    (written to a temp name and renamed — the single atomic step);
  *    an append manifest lists the previous version's files plus the
  *    new ones, a truncate (SaveMode.Overwrite) manifest lists only
  *    the new ones. N is resolved AT COMMIT TIME (not plan time), so
  *    overlapping writers serialize: whoever commits second sees the
  *    first's snapshot and appends onto it, and the publish step
  *    retries on a version-name collision instead of clobbering;
  *  - an APPEND onto a prior snapshot requires the incoming schema to
  *    match the committed manifest schema by field names and types
  *    (r14 ADVICE: ACCEPT_ANY_SCHEMA disables Spark's own check, and a
  *    reordered/retyped append would silently reinterpret the carried-
  *    forward files' cells under the new header);
  *  - readers resolve the LATEST manifest — or, with
  *    `option("version", N)`, exactly manifest N: the snapshot chain
  *    is never rewritten, so every committed version stays readable
  *    (time travel, the Iceberg snapshot-id read) — and scan exactly
  *    the files it lists. A failed job never publishes a manifest
  *    ([[GraftSinkBatchWrite.abort]] deletes the staging directory),
  *    so readers see the previous committed snapshot in full or — on
  *    a fresh path — a "no committed snapshot" error. Partial output
  *    is unreachable by construction, which GraftSinkSpec proves by
  *    injecting a mid-write task failure.
  *
  * Row encoding is per-file, named by extension in the manifest:
  *  - `tsv` (default): escaped TSV (`\t`/`\n`/`\r`/`\\` escaped, null
  *    = unescapable `\N`), longs/ints as decimal strings and doubles
  *    via `Double.toString` — an exact round-trip for every supported
  *    type, which is what lets the DuckDB oracle hash-compare a
  *    round-tripped table (`sink_roundtrip`);
  *  - `parquet` (`option("format", "parquet")`): real columnar pages
  *    through parquet-java's public writer (snappy-compressed,
  *    optional int32/int64/double/UTF-8 primitives) — the encoding a
  *    100 TB deployment runs, behind the SAME staging/manifest
  *    transaction (`sink_time_travel` oracles this path).
  * Formats interoperate: a snapshot may list files of both kinds and
  * each partition reader dispatches on the extension. All paths go
  * through the Hadoop FileSystem API with the SESSION's Hadoop
  * configuration threaded to executors ([[SerializableHadoopConf]]),
  * so `file://` in tests and HDFS/S3A on a cluster are the same code
  * INCLUDING fs.defaultFS/credentials.
  */
/** Java-serializable Hadoop Configuration carrier (the r14 ADVICE fix:
  * `new Configuration()` on executors dropped the session's
  * fs.defaultFS / S3A credentials). The driver captures
  * `sparkContext.hadoopConfiguration` once per write/scan and ships it
  * inside the factories; executors deserialize the same settings. */
class SerializableHadoopConf(@transient var conf: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

object GraftSink {
  val MANIFEST_PREFIX = "_graft_commit_v"

  /** Driver-side Hadoop conf: the active session's (so fs.defaultFS /
    * S3A settings apply), falling back to defaults off-session (specs
    * that probe manifests before any SparkSession exists). */
  private[sources] def driverConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private[sources] def fs(p: Path): FileSystem =
    p.getFileSystem(driverConf())

  private[sources] def fs(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf)

  /** (version, manifestPath) of the latest committed snapshot. */
  private[sources] def latestManifest(root: Path): Option[(Long, Path)] = {
    val f = fs(root)
    if (!f.exists(root)) return None
    f.listStatus(root).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith(MANIFEST_PREFIX))
      .flatMap { p =>
        val v = p.getName.stripPrefix(MANIFEST_PREFIX).stripSuffix(".json")
        v.toLongOption.map(_ -> p)
      }
      .sortBy(_._1).lastOption
  }

  /** Manifest path of committed version `v`, if that snapshot exists. */
  private[sources] def manifestAt(root: Path, v: Long): Option[Path] = {
    val p = new Path(root, s"$MANIFEST_PREFIX$v.json")
    if (fs(root).exists(p)) Some(p) else None
  }

  private[sources] def readText(p: Path): String = {
    val in = fs(p).open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  /** Manifest body: line 1 = schema json, then one `file<TAB>rows`
    * line per committed data file. Lines starting with `#` are
    * metadata (streaming epoch markers) and skipped here. */
  private[sources] def readManifest(p: Path): (StructType, Seq[(String, Long)]) = {
    val lines = readText(p).split("\n").toSeq.filter(_.nonEmpty)
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val files = lines.tail.filterNot(_.startsWith("#")).map { l =>
      val Array(name, rows) = l.split("\t")
      (name, rows.toLong)
    }
    (schema, files)
  }

  /** Streaming epoch markers in a manifest: highest committed epoch
    * per streaming query id (`#epoch<TAB>qid<TAB>e` lines). */
  private[sources] def readEpochs(p: Path): Map[String, Long] =
    readText(p).split("\n").toSeq
      .filter(_.startsWith("#epoch\t"))
      .map { l =>
        val parts = l.split("\t")
        parts(1) -> parts(2).toLong
      }
      .groupMapReduce(_._1)(_._2)(math.max)

  private[sources] def checkSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case IntegerType | LongType | DoubleType | StringType => ()
        case dt => throw new IllegalArgumentException(
          s"graft sink supports int/long/double/string columns; " +
            s"'${f.name}' is $dt")
      }
    }

  /** Append-compatibility: same field names and types in the same
    * order as the committed snapshot (nullability is not load-bearing
    * — both encodings mark nulls explicitly per cell). */
  private[sources] def compatible(a: StructType, b: StructType): Boolean =
    a.fields.length == b.fields.length &&
      a.fields.zip(b.fields).forall { case (x, y) =>
        x.name == y.name && x.dataType == y.dataType
      }

  private[sources] def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c => b.append(c)
    }
    b.toString
  }

  private[sources] def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case o => b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Parquet MessageType for a (pre-checked) sink schema: optional
    * primitives, strings as UTF-8-annotated binary. */
  private[sources] def parquetType(
      schema: StructType): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = org.apache.parquet.schema.Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case IntegerType => b.optional(INT32).named(f.name)
        case LongType => b.optional(INT64).named(f.name)
        case DoubleType => b.optional(DOUBLE).named(f.name)
        case StringType => b.optional(BINARY)
          .as(org.apache.parquet.schema.LogicalTypeAnnotation.stringType())
          .named(f.name)
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }
    b.named("graft_sink")
  }
}

class GraftAtomicSinkProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  /** Reads infer from the requested (or latest) committed manifest; a
    * fresh path (write-only so far) infers an empty schema — the scan
    * builder throws the real "no committed snapshot" error if a read
    * follows. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = new Path(options.get("path"))
    val manifest = Option(options.get("version")) match {
      case Some(v) =>
        // only readers pass `version`; a missing snapshot must fail
        // HERE with the real error (an empty inferred schema would
        // surface as an unresolved-column analysis error downstream)
        Some(GraftSink.manifestAt(path, v.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"graft sink at $path has no committed version $v " +
              s"(latest: ${GraftSink.latestManifest(path).map(_._1)
                .getOrElse("none")})")))
      case None => GraftSink.latestManifest(path).map(_._2)
    }
    manifest.map(GraftSink.readManifest(_)._1).getOrElse(new StructType())
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSinkTable(properties.get("path"), schema)
}

class GraftSinkTable(path: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSinkScanBuilder(path,
      Option(options.get("version")).map(_.toLong),
      Option(options.get("startVersion")).map(_.toLong))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftSinkWriteBuilder(path, info.schema(), info.queryId(),
      truncate = false,
      format = Option(info.options.get("format")).getOrElse("tsv"))
}

class GraftSinkWriteBuilder(path: String, schema: StructType,
    queryId: String, truncate: Boolean, format: String)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftSinkWriteBuilder(path, schema, queryId, truncate = true, format)
  override def build(): Write = new Write {
    GraftSink.checkSchema(schema)
    require(format == "tsv" || format == "parquet",
      s"graft sink format must be tsv or parquet, got '$format'")
    override def toBatch: BatchWrite =
      new GraftSinkBatchWrite(path, schema, queryId, truncate, format)
    override def toStreaming: org.apache.spark.sql.connector.write
        .streaming.StreamingWrite =
      new GraftSinkStreamingWrite(path, schema, queryId, format)
  }
}

case class GraftSinkCommitMessage(stagedFile: String, fileName: String,
    rows: Long) extends WriterCommitMessage

class GraftSinkBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean, format: String) extends BatchWrite {
  private val root = new Path(path)
  private val stagingDir = new Path(root, s"_staging/$queryId")
  private val sconf = new SerializableHadoopConf(GraftSink.driverConf())

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(stagingDir.toString, schema.json, format,
      sconf)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftSinkCommit.publish(root, stagingDir, schema, truncate,
      messages.collect { case m: GraftSinkCommitMessage => m },
      epochMarker = None)

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // no manifest was published, so nothing became visible; drop the
    // whole staging directory (covers tasks that never sent a message)
    try GraftSink.fs(root).delete(stagingDir, true)
    catch { case _: Throwable => () }
  }
}

/** The shared manifest-publication protocol — batch and streaming
  * commits differ only in staging dir and the idempotence marker. */
private[sources] object GraftSinkCommit {
  def publish(root: Path, stagingDir: Path, schema: StructType,
      truncate: Boolean, mine: Seq[GraftSinkCommitMessage],
      epochMarker: Option[(String, Long)]): Unit = {
    val fs = GraftSink.fs(root)
    // snapshot resolution happens HERE, not at plan time: an
    // overlapping writer that committed since this job was planned is
    // visible now, so its snapshot is what an append carries forward
    val latest = GraftSink.latestManifest(root)
    val priorEpochs: Map[String, Long] =
      latest.map { case (_, m) => GraftSink.readEpochs(m) }
        .getOrElse(Map.empty)
    // streaming EXACTLY-ONCE: a re-committed epoch (driver recovery
    // replays the last epoch against the same checkpoint) is a no-op —
    // the marker proves the snapshot already holds its rows, and the
    // retry's staged files must be dropped, not double-published
    epochMarker.foreach { case (qid, epoch) =>
      if (priorEpochs.get(qid).exists(_ >= epoch)) {
        try fs.delete(stagingDir, true) catch { case _: Throwable => () }
        return
      }
    }
    val dataDir = new Path(root, "data")
    fs.mkdirs(dataDir)
    mine.foreach { m =>
      val ok = fs.rename(new Path(m.stagedFile),
        new Path(dataDir, m.fileName))
      if (!ok) throw new java.io.IOException(
        s"commit failed to publish ${m.stagedFile}")
    }
    val prior: Seq[(String, Long)] =
      if (truncate) Seq.empty
      else latest.map { case (_, m) =>
        val (priorSchema, priorFiles) = GraftSink.readManifest(m)
        // r14 ADVICE (medium): ACCEPT_ANY_SCHEMA disables Spark's own
        // append validation, and a reordered/retyped append would
        // reinterpret the carried-forward files' cells under the new
        // header — refuse instead
        if (!GraftSink.compatible(schema, priorSchema))
          throw new IllegalArgumentException(
            s"graft sink append schema ${schema.simpleString} is " +
              s"incompatible with committed snapshot schema " +
              s"${priorSchema.simpleString}; use SaveMode.Overwrite " +
              "to replace the table")
        priorFiles
      }.getOrElse(Seq.empty)
    val epochs: Map[String, Long] =
      (if (truncate) Map.empty[String, Long] else priorEpochs) ++
        epochMarker.toMap
    val body = (schema.json +:
      (epochs.toSeq.sortBy(_._1).map { case (q, e) => s"#epoch\t$q\t$e" } ++
        (prior ++ mine.map(m => (m.fileName, m.rows)))
          .map { case (n, r) => s"$n\t$r" })).mkString("\n")
    // the ONE atomic step: temp manifest renamed onto its version
    // name. On stores whose rename fails when the destination exists
    // (HDFS), a concurrent publish loses the rename and retries at the
    // next version; the exists-check narrows the same race on local fs
    val tmp = new Path(root, s".manifest_tmp_${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    var version = latest.map(_._1).getOrElse(0L) + 1
    var published = false
    var attempts = 0
    while (!published) {
      val target = new Path(root, s"${GraftSink.MANIFEST_PREFIX}$version.json")
      if (fs.exists(target)) version += 1
      else if (fs.rename(tmp, target)) published = true
      else {
        attempts += 1
        if (attempts > 64) throw new java.io.IOException(
          "commit failed to publish manifest")
        version += 1
      }
    }
    fs.delete(stagingDir, true)
  }
}

/** STREAMING write surface (r15): the same staging/manifest
  * transaction, one commit per epoch, appended onto the snapshot
  * chain. Exactly-once comes from the `#epoch` marker each commit
  * records: a replayed epoch (post-recovery) is detected against the
  * latest manifest and dropped instead of double-published — the
  * Delta/Iceberg txn-id discipline on this sink's own chain. */
class GraftSinkStreamingWrite(path: String, schema: StructType,
    queryId: String, format: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val root = new Path(path)
  private val sconf = new SerializableHadoopConf(GraftSink.driverConf())

  private def epochStaging(epochId: Long): Path =
    new Path(root, s"_staging/$queryId/e$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write
      .streaming.StreamingDataWriterFactory =
    new GraftSinkStreamingWriterFactory(
      new Path(root, s"_staging/$queryId").toString, schema.json, format,
      sconf)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftSinkCommit.publish(root, epochStaging(epochId), schema,
      truncate = false,
      messages.collect { case m: GraftSinkCommitMessage => m },
      epochMarker = Some((queryId, epochId)))

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    try GraftSink.fs(root).delete(epochStaging(epochId), true)
    catch { case _: Throwable => () }
  }
}

class GraftSinkStreamingWriterFactory(stagingRoot: String,
    schemaJson: String, format: String, sconf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming
    .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val dir = s"$stagingRoot/e$epochId"
    if (format == "parquet")
      new GraftSinkParquetWriter(dir, schema, partitionId, taskId,
        sconf.conf)
    else new GraftSinkDataWriter(dir, schema, partitionId, taskId,
      sconf.conf)
  }
}

class GraftSinkWriterFactory(stagingDir: String, schemaJson: String,
    format: String, sconf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    if (format == "parquet")
      new GraftSinkParquetWriter(stagingDir, schema, partitionId, taskId,
        sconf.conf)
    else
      new GraftSinkDataWriter(stagingDir, schema, partitionId, taskId,
        sconf.conf)
  }
}

class GraftSinkDataWriter(stagingDir: String, schema: StructType,
    partitionId: Int, taskId: Long, conf: Configuration)
    extends DataWriter[InternalRow] {
  private val fileName =
    s"part-$partitionId-$taskId-${UUID.randomUUID()}.tsv"
  private val staged = new Path(new Path(stagingDir), fileName)
  private val out = {
    val f = GraftSink.fs(staged, conf)
    f.mkdirs(staged.getParent)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      f.create(staged, true), "UTF-8"))
  }
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "\\N"
      else f.dataType match {
        case IntegerType => row.getInt(i).toString
        case LongType => row.getLong(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => GraftSink.escape(row.getUTF8String(i).toString)
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }
    out.write(cells.mkString("\t"))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftSinkCommitMessage(staged.toString, fileName, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    try GraftSink.fs(staged, conf).delete(staged, false)
    catch { case _: Throwable => () }
  }

  override def close(): Unit = ()
}

/** Columnar task writer: parquet-java's public example writer (real
  * page encoding + snappy), same staging/commit-message protocol as
  * the TSV writer — the transaction does not care about the encoding. */
class GraftSinkParquetWriter(stagingDir: String, schema: StructType,
    partitionId: Int, taskId: Long, conf: Configuration)
    extends DataWriter[InternalRow] {
  private val fileName =
    s"part-$partitionId-$taskId-${UUID.randomUUID()}.parquet"
  private val staged = new Path(new Path(stagingDir), fileName)
  private val msgType = GraftSink.parquetType(schema)
  private val writer = {
    GraftSink.fs(staged, conf).mkdirs(staged.getParent)
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(staged, conf))
      .withType(msgType)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
  }
  private val groups =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val g = groups.newGroup()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case IntegerType => g.add(i, row.getInt(i))
        case LongType => g.add(i, row.getLong(i))
        case DoubleType => g.add(i, row.getDouble(i))
        case StringType => g.add(i, row.getUTF8String(i).toString)
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftSinkCommitMessage(staged.toString, fileName, rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    try GraftSink.fs(staged, conf).delete(staged, false)
    catch { case _: Throwable => () }
  }

  override def close(): Unit = ()
}

// ---------------------------------------------------------------- read

/** Batch read resolution: `version` pins the snapshot (else latest);
  * `startVersion` turns the scan into a CHANGE-FEED read — exactly the
  * files versions (start, end] ADDED (the batch twin of the streaming
  * MicroBatchStream's version-delta planning; startVersion = 0 is the
  * full snapshot, a truncate in the range surfaces only rows written
  * after it). */
class GraftSinkScanBuilder(path: String, version: Option[Long],
    startVersion: Option[Long]) extends ScanBuilder {
  override def build(): Scan = {
    val root = new Path(path)
    val manifest = version match {
      case Some(v) => GraftSink.manifestAt(root, v).getOrElse(
        throw new IllegalArgumentException(
          s"graft sink at $path has no committed version $v " +
            s"(latest: ${GraftSink.latestManifest(root).map(_._1)
              .getOrElse("none")})"))
      case None => GraftSink.latestManifest(root).map(_._2).getOrElse(
        throw new IllegalStateException(
          s"graft sink at $path has no committed snapshot"))
    }
    val (schema, files) = GraftSink.readManifest(manifest)
    val delta = startVersion match {
      case Some(s) if s > 0 =>
        val startFiles = GraftSink.manifestAt(root, s).map(m =>
          GraftSink.readManifest(m)._2.map(_._1).toSet).getOrElse(
          throw new IllegalArgumentException(
            s"graft sink at $path has no committed startVersion $s"))
        files.filterNot { case (n, _) => startFiles(n) }
      case _ => files
    }
    new GraftSinkScan(path, schema, delta)
  }
}

case class GraftSinkFilePartition(file: String) extends InputPartition

class GraftSinkScan(path: String, schema: StructType,
    files: Seq[(String, Long)]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (name, _) =>
      GraftSinkFilePartition(new Path(new Path(path), s"data/$name").toString)
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSinkReaderFactory(schema.json,
      new SerializableHadoopConf(GraftSink.driverConf()))
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftSinkMicroBatchStream(path, schema)
}

/** A committed-snapshot VERSION as a streaming offset. */
case class GraftSinkOffset(version: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** STREAMING read surface (r15): the manifest chain consumed as a
  * stream — each micro-batch is the set of data files a version range
  * ADDED (the Delta/Iceberg "table as a stream" pattern on this sink's
  * own chain). Offsets are manifest versions, so restart resumes
  * exactly where the checkpoint left off and nothing is re-read; the
  * chain is append-only (appends carry prior files forward), so
  * files(end) − files(start) is precisely the delta. A TRUNCATE
  * surfaces only the rows it wrote (its manifest drops prior files —
  * replaced history is not replayed), which is the documented
  * change-feed semantics for overwrites. */
class GraftSinkMicroBatchStream(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  private val root = new Path(path)

  private def filesAt(version: Long): Set[String] =
    if (version <= 0) Set.empty
    else GraftSink.manifestAt(root, version)
      .map(m => GraftSink.readManifest(m)._2.map(_._1).toSet)
      .getOrElse(Set.empty)

  override def latestOffset():
      org.apache.spark.sql.connector.read.streaming.Offset =
    GraftSinkOffset(GraftSink.latestManifest(root).map(_._1).getOrElse(0L))

  override def initialOffset():
      org.apache.spark.sql.connector.read.streaming.Offset =
    GraftSinkOffset(0L)

  override def deserializeOffset(json: String):
      org.apache.spark.sql.connector.read.streaming.Offset =
    GraftSinkOffset(json.trim.toLong)

  override def planInputPartitions(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset):
      Array[InputPartition] = {
    val s = start.asInstanceOf[GraftSinkOffset].version
    val e = end.asInstanceOf[GraftSinkOffset].version
    val delta = (filesAt(e) -- filesAt(s)).toSeq.sorted
    delta.map(name => GraftSinkFilePartition(
      new Path(new Path(path), s"data/$name").toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSinkReaderFactory(schema.json,
      new SerializableHadoopConf(GraftSink.driverConf()))

  override def commit(
      end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()

  override def stop(): Unit = ()
}

class GraftSinkReaderFactory(schemaJson: String,
    sconf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GraftSinkFilePartition].file
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    if (file.endsWith(".parquet"))
      new GraftSinkParquetReader(file, schema, sconf.conf)
    else new GraftSinkPartitionReader(file, schema, sconf.conf)
  }
}

class GraftSinkPartitionReader(file: String, schema: StructType,
    conf: Configuration) extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(file)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      GraftSink.fs(p, conf).open(p), "UTF-8"))
  }
  private var line: String = _

  override def next(): Boolean = { line = in.readLine(); line != null }

  override def get(): InternalRow = {
    // -1 keeps trailing empty cells (a null/empty string in the last
    // column still yields an arity-n split)
    val cells = line.split("\t", -1)
    val vals = schema.fields.zipWithIndex.map { case (f, i) =>
      val c = cells(i)
      if (c == "\\N") null
      else f.dataType match {
        case IntegerType => java.lang.Integer.valueOf(c)
        case LongType => java.lang.Long.valueOf(c)
        case DoubleType => java.lang.Double.valueOf(c)
        case StringType => UTF8String.fromString(GraftSink.unescape(c))
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = in.close()
}

/** Columnar task reader: parquet-java Group reader over one committed
  * file; cells with repetition count 0 are the nulls the writer
  * skipped. */
class GraftSinkParquetReader(file: String, schema: StructType,
    conf: Configuration) extends PartitionReader[InternalRow] {
  private val reader = {
    val c = new Configuration(conf)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new Path(file))
      .withConf(c)
      .build()
  }
  private var group: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = { group = reader.read(); group != null }

  override def get(): InternalRow = {
    val vals = schema.fields.zipWithIndex.map { case (f, i) =>
      if (group.getFieldRepetitionCount(i) == 0) null
      else f.dataType match {
        case IntegerType => java.lang.Integer.valueOf(group.getInteger(i, 0))
        case LongType => java.lang.Long.valueOf(group.getLong(i, 0))
        case DoubleType => java.lang.Double.valueOf(group.getDouble(i, 0))
        case StringType => UTF8String.fromString(group.getString(i, 0))
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = reader.close()
}
