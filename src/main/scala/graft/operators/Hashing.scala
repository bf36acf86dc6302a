package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Portable deterministic hashing used by the dedup/similarity operators.
  *
  * `hash60` maps a string to a positive 60-bit long via md5 — chosen
  * because md5 produces identical hex in every engine (Spark, DuckDB,
  * Python), so oracle queries can reproduce signatures exactly. At scale
  * md5 is ~100 MB/s/core; fine for shingle-sized inputs. (xxhash64 would
  * be faster but is Spark-specific.)
  */
object Hashing {

  /** Positive 60-bit hash of a string column: first 15 hex chars of md5.
    * Backed by the native codegen'd [[graft.functions.Md5Prefix60]]
    * (identical value to `conv(substring(md5(c),1,15),16,10)` without
    * the hex-string round-trip — this runs once per shingle/token, so
    * the allocation savings compound on the dedup hot path).
    *
    * Built DIRECTLY as an expression Column (no per-session function
    * registry): the Column is session-independent, so it analyzes
    * correctly with no active session on the calling thread, under
    * `newSession()`, and across threads — `call_function` would resolve
    * by name at analysis time and fail with UNRESOLVED_ROUTINE on any
    * session that never registered it. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.Md5Prefix60(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Same hash computed driver-side (for deterministic constants such as
    * LSH hyperplanes). */
  def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment equivalent of [[hash60]] — kept adjacent so the
    * two can never drift. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"
}
