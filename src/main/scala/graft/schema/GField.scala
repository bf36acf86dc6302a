package graft.schema

import graft.dsl.{Col, Expr}
import org.apache.spark.sql.types._

/** A named constraint: `valid` must hold for a row to pass validation. */
final case class Check(expr: Expr, message: String)

/** Field definitions — re-expression of flycatcher src/flycatcher/fields.py
  * (Integer:341 / Float:440 / String:522 / Boolean:618 / Datetime:642 /
  * Date:720 + Field() metadata, fields.py:109) onto Spark's type system.
  *
  * Each field yields:
  *   - a Catalyst [[org.apache.spark.sql.types.StructField]] (dtype + nullability),
  *   - a list of [[Check]]s compiled from its declared constraints,
  *   - DDL + metadata (primaryKey/unique/index/description) for [[GSchema.ddl]].
  */
sealed trait GField {
  def name: String
  def nullable: Boolean
  def default: Option[Any]
  def primaryKey: Boolean
  def unique: Boolean
  def index: Boolean
  def description: Option[String]
  def dataType: DataType

  def structField: StructField = {
    val md = new MetadataBuilder()
    description.foreach(md.putString("description", _))
    if (primaryKey) md.putBoolean("primaryKey", true)
    if (unique) md.putBoolean("unique", true)
    if (index) md.putBoolean("index", true)
    StructField(name, dataType, nullable = nullable, md.build())
  }

  /** Constraint checks from declared bounds; null values pass (nullability
    * is enforced separately — see Validator). */
  def checks: Seq[Check]

  protected def c: Col = Col(name)
}

final case class GLong(
    name: String,
    gt: Option[Long] = None, ge: Option[Long] = None,
    lt: Option[Long] = None, le: Option[Long] = None,
    multipleOf: Option[Long] = None,
    nullable: Boolean = false, default: Option[Any] = None,
    primaryKey: Boolean = false, unique: Boolean = false, index: Boolean = false,
    description: Option[String] = None,
    /** DDL metadata only, like the reference (fields.py:37 autoincrement). */
    autoincrement: Boolean = false,
    width: Int = 64) extends GField {
  def dataType: DataType = width match {
    case 64 => LongType
    case 32 => IntegerType
    case 16 => ShortType
    case w  => throw new IllegalArgumentException(s"unsupported int width $w")
  }
  def checks: Seq[Check] =
    gt.map(v => Check(c > v, s"$name must be > $v")).toSeq ++
    ge.map(v => Check(c >= v, s"$name must be >= $v")) ++
    lt.map(v => Check(c < v, s"$name must be < $v")) ++
    le.map(v => Check(c <= v, s"$name must be <= $v")) ++
    multipleOf.map(v => Check((c % v) === 0L, s"$name must be multiple of $v"))
}

final case class GDouble(
    name: String,
    gt: Option[Double] = None, ge: Option[Double] = None,
    lt: Option[Double] = None, le: Option[Double] = None,
    nullable: Boolean = false, default: Option[Any] = None,
    primaryKey: Boolean = false, unique: Boolean = false, index: Boolean = false,
    description: Option[String] = None) extends GField {
  def dataType: DataType = DoubleType
  def checks: Seq[Check] =
    gt.map(v => Check(c > v, s"$name must be > $v")).toSeq ++
    ge.map(v => Check(c >= v, s"$name must be >= $v")) ++
    lt.map(v => Check(c < v, s"$name must be < $v")) ++
    le.map(v => Check(c <= v, s"$name must be <= $v"))
}

final case class GString(
    name: String,
    minLength: Option[Int] = None, maxLength: Option[Int] = None,
    pattern: Option[String] = None,
    nullable: Boolean = false, default: Option[Any] = None,
    primaryKey: Boolean = false, unique: Boolean = false, index: Boolean = false,
    description: Option[String] = None) extends GField {
  def dataType: DataType = StringType
  def checks: Seq[Check] =
    minLength.map(v => Check(c.str.lenChars >= v.toLong, s"$name must have at least $v characters")).toSeq ++
    maxLength.map(v => Check(c.str.lenChars <= v.toLong, s"$name must have at most $v characters")) ++
    pattern.map(p => Check(c.str.contains(p), s"$name must match pattern: $p"))
}

final case class GBool(
    name: String,
    nullable: Boolean = false, default: Option[Any] = None,
    primaryKey: Boolean = false, unique: Boolean = false, index: Boolean = false,
    description: Option[String] = None) extends GField {
  def dataType: DataType = BooleanType
  def checks: Seq[Check] = Nil
}

final case class GTimestamp(
    name: String,
    gt: Option[java.time.Instant] = None, ge: Option[java.time.Instant] = None,
    lt: Option[java.time.Instant] = None, le: Option[java.time.Instant] = None,
    nullable: Boolean = false, default: Option[Any] = None,
    primaryKey: Boolean = false, unique: Boolean = false, index: Boolean = false,
    description: Option[String] = None) extends GField {
  def dataType: DataType = TimestampType
  def checks: Seq[Check] =
    gt.map(v => Check(c > v, s"$name must be > $v")).toSeq ++
    ge.map(v => Check(c >= v, s"$name must be >= $v")) ++
    lt.map(v => Check(c < v, s"$name must be < $v")) ++
    le.map(v => Check(c <= v, s"$name must be <= $v"))
}

final case class GDate(
    name: String,
    nullable: Boolean = false, default: Option[Any] = None,
    primaryKey: Boolean = false, unique: Boolean = false, index: Boolean = false,
    description: Option[String] = None) extends GField {
  def dataType: DataType = DateType
  def checks: Seq[Check] = Nil
}

/** Free-typed field (binary / array / map …) for the pipeline extensions —
  * no constraint surface, just schema membership. */
final case class GTyped(
    name: String, dataType: DataType,
    nullable: Boolean = false, default: Option[Any] = None,
    primaryKey: Boolean = false, unique: Boolean = false, index: Boolean = false,
    description: Option[String] = None) extends GField {
  def checks: Seq[Check] = Nil
}
