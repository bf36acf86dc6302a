package graft

/** `import graft.dsl._` gives the reference-style `col("x") > col("y")` DSL. */
package object dsl {
  /** Create a field reference (reference: validators/core.py:108 `col`). */
  def col(name: String): Col = Col(name)
  def lit(v: Any): Lit       = Lit(v)
}
