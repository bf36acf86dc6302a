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
  *    the new ones;
  *  - readers resolve the LATEST manifest and scan exactly the files
  *    it lists. A failed job never publishes a manifest ([[BatchWrite
  *    .abort]] deletes the staging directory), so readers see the
  *    previous committed snapshot in full or — on a fresh path — a
  *    "no committed snapshot" error. Partial output is unreachable by
  *    construction, which GraftSinkSpec proves by injecting a
  *    mid-write task failure.
  *
  * Row encoding is escaped TSV (`\t`/`\n`/`\r`/`\\` escaped, null =
  * unescapable `\N`), longs/ints as decimal strings and doubles via
  * `Double.toString` — an exact round-trip for every supported type
  * (int, long, double, string), which is what lets the DuckDB oracle
  * hash-compare a round-tripped table (`sink_roundtrip`). At 100 TB
  * the encoding would be parquet, but the TRANSACTIONAL surface —
  * staging, task messages, manifest versions, atomic rename — is
  * exactly this one; all paths go through the Hadoop FileSystem API,
  * so `file://` in tests and HDFS/S3A on a cluster are the same code.
  */
object GraftSink {
  val MANIFEST_PREFIX = "_graft_commit_v"

  private[sources] def fs(p: Path): FileSystem =
    p.getFileSystem(new Configuration())

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

  /** Manifest body: line 1 = schema json, then one `file<TAB>rows`
    * line per committed data file. */
  private[sources] def readManifest(p: Path): (StructType, Seq[(String, Long)]) = {
    val in = fs(p).open(p)
    val text = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val files = lines.tail.map { l =>
      val Array(name, rows) = l.split("\t")
      (name, rows.toLong)
    }
    (schema, files)
  }

  private[sources] def checkSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case IntegerType | LongType | DoubleType | StringType => ()
        case dt => throw new IllegalArgumentException(
          s"graft sink supports int/long/double/string columns; " +
            s"'${f.name}' is $dt")
      }
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
}

class GraftAtomicSinkProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  /** Reads infer from the latest committed manifest; a fresh path
    * (write-only so far) infers an empty schema — the scan builder
    * throws the real "no committed snapshot" error if a read follows. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = new Path(options.get("path"))
    GraftSink.latestManifest(path)
      .map { case (_, m) => GraftSink.readManifest(m)._1 }
      .getOrElse(new StructType())
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
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSinkScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftSinkWriteBuilder(path, info.schema(), info.queryId(),
      truncate = false)
}

class GraftSinkWriteBuilder(path: String, schema: StructType,
    queryId: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftSinkWriteBuilder(path, schema, queryId, truncate = true)
  override def build(): Write = new Write {
    GraftSink.checkSchema(schema)
    override def toBatch: BatchWrite =
      new GraftSinkBatchWrite(path, schema, queryId, truncate)
  }
}

case class GraftSinkCommitMessage(stagedFile: String, fileName: String,
    rows: Long) extends WriterCommitMessage

class GraftSinkBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean) extends BatchWrite {
  private val root = new Path(path)
  private val stagingDir = new Path(root, s"_staging/$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(stagingDir.toString, schema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = GraftSink.fs(root)
    val dataDir = new Path(root, "data")
    fs.mkdirs(dataDir)
    val mine = messages.collect { case m: GraftSinkCommitMessage => m }
    mine.foreach { m =>
      val ok = fs.rename(new Path(m.stagedFile),
        new Path(dataDir, m.fileName))
      if (!ok) throw new java.io.IOException(
        s"commit failed to publish ${m.stagedFile}")
    }
    val prior: Seq[(String, Long)] =
      if (truncate) Seq.empty
      else GraftSink.latestManifest(root)
        .map { case (_, m) => GraftSink.readManifest(m)._2 }
        .getOrElse(Seq.empty)
    val version = GraftSink.latestManifest(root).map(_._1).getOrElse(0L) + 1
    val body = (schema.json +:
      (prior ++ mine.map(m => (m.fileName, m.rows)))
        .map { case (n, r) => s"$n\t$r" }).mkString("\n")
    // the ONE atomic step: temp manifest renamed onto its version name
    val tmp = new Path(root, s".manifest_tmp_${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp,
        new Path(root, s"${GraftSink.MANIFEST_PREFIX}$version.json")))
      throw new java.io.IOException("commit failed to publish manifest")
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // no manifest was published, so nothing became visible; drop the
    // whole staging directory (covers tasks that never sent a message)
    try GraftSink.fs(root).delete(stagingDir, true)
    catch { case _: Throwable => () }
  }
}

class GraftSinkWriterFactory(stagingDir: String, schemaJson: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftSinkDataWriter(stagingDir,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partitionId, taskId)
}

class GraftSinkDataWriter(stagingDir: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val fileName =
    s"part-$partitionId-$taskId-${UUID.randomUUID()}.tsv"
  private val staged = new Path(new Path(stagingDir), fileName)
  private val out = {
    val f = GraftSink.fs(staged)
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
    try GraftSink.fs(staged).delete(staged, false)
    catch { case _: Throwable => () }
  }

  override def close(): Unit = ()
}

// ---------------------------------------------------------------- read

class GraftSinkScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = {
    val root = new Path(path)
    val (schema, files) = GraftSink.latestManifest(root)
      .map { case (_, m) => GraftSink.readManifest(m) }
      .getOrElse(throw new IllegalStateException(
        s"graft sink at $path has no committed snapshot"))
    new GraftSinkScan(path, schema, files)
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
    new GraftSinkReaderFactory(schema.json)
}

class GraftSinkReaderFactory(schemaJson: String)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new GraftSinkPartitionReader(
      partition.asInstanceOf[GraftSinkFilePartition].file,
      DataType.fromJson(schemaJson).asInstanceOf[StructType])
}

class GraftSinkPartitionReader(file: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(file)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      GraftSink.fs(p).open(p), "UTF-8"))
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
