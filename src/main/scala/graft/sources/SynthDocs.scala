package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 batch source: deterministic synthetic
  * documents, `spark.read.format("graft.sources.SynthDocsProvider")`.
  *
  * Rows are a pure function of `doc_id` (text = lowercase-hex
  * md5(decimal string), source = "src" + id % 4), which makes a
  * CUSTOM SOURCE oracle-checkable: DuckDB reproduces every row from
  * `range()` + `md5()`, so the driver's hash compare covers the whole
  * read path — schema, pruning, pushdown, partition planning.
  *
  * The two capabilities that matter at 100 TB are real, not cosmetic:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): >, >=, <, <=,
  *    = predicates on `doc_id` narrow the GENERATED range — the
  *    source-level analog of parquet row-group pruning / partition
  *    pruning. A pushed `doc_id >= N` means partitions covering
  *    [0, N) are never planned, not merely filtered after generation;
  *    pushed filters are also fully evaluated here, so they are
  *    removed from the residual scan filter (`pushedFilters` returns
  *    empty) — the spec asserts on the explain output.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes exactly the projected columns — `count(*)`
  *    over this source allocates zero-field rows and never computes
  *    an md5.
  *
  * Parallelism: the surviving id range splits into `slices` input
  * partitions (like `spark.range`); each reader is independent, so
  * the source scales linearly with executors. */
object SynthDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("source", StringType, nullable = false)))

  private[sources] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
}

class SynthDocsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthDocsTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

final class SynthDocsTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synth_docs($rows)"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(rows, slices)
}

final class SynthDocsScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var required: StructType = SynthDocs.schema

  /** Accepts (and fully evaluates) range predicates on doc_id; anything
    * else stays a residual filter for Spark to apply post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    residual
  }
  // range pushdown is exact — nothing needs re-checking downstream
  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SynthDocsScan(lo, math.max(lo, hi),
    slices, required)
}

final class SynthDocsScan(
    lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthDocs[$lo, $hi) slices=$slices cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val k = math.min(slices.toLong, n).toInt
      (0 until k).map { i =>
        // contiguous even split, remainder spread over the first slices
        val start = lo + i * n / k
        val end = lo + (i + 1) * n / k
        SynthDocsPartition(start, end): InputPartition
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required)
}

final case class SynthDocsPartition(start: Long, end: Long)
    extends InputPartition

final class SynthDocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthDocsPartition]
    new SynthDocsReader(sp.start, sp.end, required)
  }
}

final class SynthDocsReader(start: Long, end: Long, required: StructType)
    extends PartitionReader[InternalRow] {
  private var id = start - 1
  // column generators bound once per reader, not per row
  private val gens: Array[Long => Any] = required.fields.map(_.name).map {
    case "doc_id" => (i: Long) => i
    case "text" => (i: Long) =>
      UTF8String.fromString(SynthDocs.md5Hex(i.toString))
    case "source" => (i: Long) => UTF8String.fromString("src" + (i % 4))
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }
  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow =
    new GenericInternalRow(gens.map(g => g(id)).asInstanceOf[Array[Any]])
  override def close(): Unit = ()
}
