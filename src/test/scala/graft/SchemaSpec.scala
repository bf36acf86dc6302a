package graft

import graft.dsl._
import graft.schema._
import org.apache.spark.sql.types._

/** Mirrors reference tests/test_schema.py + test_fields.py: field
  * collection, metadata, dtype mapping, DDL generation. */
class SchemaSpec extends SparkSpec {

  val user: GSchema = GSchema("UserSchema")
    .field(GLong("id", primaryKey = true))
    .field(GString("username", minLength = Some(3), maxLength = Some(50), unique = true))
    .field(GString("email", pattern = Some("^[^@]+@[^@]+\\.[^@]+$"), index = true))
    .field(GLong("age", ge = Some(13L), le = Some(120L)))
    .field(GBool("is_active", default = Some(true)))
    .field(GTimestamp("created_at"))
    .field(GString("bio", nullable = true))

  test("fields collected with names in order") {
    assert(user.fields.map(_.name) ==
      Seq("id", "username", "email", "age", "is_active", "created_at", "bio"))
    assert(user.fieldMap("age").asInstanceOf[GLong].ge.contains(13L))
  }

  test("structType maps types and nullability") {
    val st = user.structType
    assert(st("id").dataType == LongType)
    assert(st("username").dataType == StringType)
    assert(st("is_active").dataType == BooleanType)
    assert(st("created_at").dataType == TimestampType)
    assert(!st("id").nullable)
    assert(st("bio").nullable)
  }

  test("int width variants") {
    assert(GLong("a", width = 32).dataType == IntegerType)
    assert(GLong("a", width = 16).dataType == ShortType)
    intercept[IllegalArgumentException](GLong("a", width = 8).dataType)
  }

  test("field metadata carries pk/unique/index/description") {
    val st = user.structType
    assert(st("id").metadata.getBoolean("primaryKey"))
    assert(st("username").metadata.getBoolean("unique"))
    assert(st("email").metadata.getBoolean("index"))
  }

  test("constraint checks generated per field") {
    val msgs = user.allChecks.map(_.message)
    assert(msgs.contains("age must be >= 13"))
    assert(msgs.contains("age must be <= 120"))
    assert(msgs.contains("username must have at least 3 characters"))
    assert(msgs.exists(_.startsWith("email must match pattern")))
  }

  test("model validators collected in order") {
    val s = user
      .check(col("age") >= 18L, "adults only")
      .check(col("username").str.lenChars > 0L)
    assert(s.modelChecks.map(_.message) == Seq("adults only", "Validation failed"))
  }

  test("schema inheritance: parent fields first, child overrides by name") {
    val base = GSchema("BaseSchema")
      .field(GLong("id", primaryKey = true))
      .field(GString("name"))
      .check(col("id") >= 0L, "id non-negative")
    val child = GSchema("ChildSchema")
      .field(GString("name", minLength = Some(3))) // override
      .field(GBool("active"))
      .extend(base)
    assert(child.fields.map(_.name) == Seq("id", "name", "active"))
    assert(child.fieldMap("name").asInstanceOf[GString].minLength.contains(3))
    assert(child.modelChecks.map(_.message) == Seq("id non-negative"))
  }

  test("multiple_of constraint") {
    val s = GSchema("S").field(GLong("score", multipleOf = Some(10L)))
    assert(s.allChecks.head.message == "score must be multiple of 10")
  }

  test("ddl generation (sqlalchemy analog)") {
    val ddl = user.ddl()
    assert(ddl.startsWith("CREATE TABLE users ("))
    assert(ddl.contains("id BIGINT NOT NULL COMMENT 'primary key'"))
    assert(ddl.contains("bio STRING"))
    assert(ddl.contains("is_active BOOLEAN NOT NULL DEFAULT true"))
    assert(ddl.contains("USING parquet"))
  }

  test("default table name strips Schema suffix and pluralizes") {
    assert(GSchema("PersonSchema").defaultTableName == "persons")
    assert(GSchema("UserSchema").defaultTableName == "users")
  }
}
