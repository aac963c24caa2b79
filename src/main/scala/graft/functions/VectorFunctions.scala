package graft.functions

import org.apache.spark.sql.Column

/** Public face of the engine's native vector expressions (see
  * org.apache.spark.sql.graftvec for the Catalyst internals). */
object VectorFunctions {

  /** Codegen'd dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.dotColumn(a, b)
}
