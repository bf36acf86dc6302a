package graft

/** `import graft.dsl._` gives the reference-style `col("x") > col("y")` DSL. */
package object dsl {
  /** Create a field reference (reference: validators/core.py:108 `col`). */
  def col(name: String): Col = Col(name)
  def lit(v: Any): Lit       = Lit(v)

  /** Raw-expression escape hatch (reference dict-result validators):
    * bulk-path Spark Column + optional row-path callable. */
  def raw(column: org.apache.spark.sql.Column,
      rowFn: Option[Map[String, Any] => Any] = None): Raw = Raw(column, rowFn)
}
