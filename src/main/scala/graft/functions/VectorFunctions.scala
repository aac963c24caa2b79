package graft.functions

import org.apache.spark.sql.Column

/** Public face of the engine's native vector expressions (see
  * org.apache.spark.sql.graftvec for the Catalyst internals). */
object VectorFunctions {

  /** Codegen'd dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.dotColumn(a, b)

  /** Codegen'd common-element count of two sorted-ascending,
    * duplicate-free array<long> columns (the dedup verification
    * kernel — see SortedIntersectCount for the caller contract). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.sortedIntersectCountColumn(a, b)

  /** Top-k IVF cell ids of a vector against a literal codebook, in rank
    * order (see IvfTopCells for the cosine/tie contract). */
  def ivfTopCells(v: Column, nrm: Column, cents: Seq[(Int, Seq[Double])],
      k: Int, tieLargestCell: Boolean): Column =
    org.apache.spark.sql.graftvec.GraftVec
      .ivfTopCellsColumn(v, nrm, cents, k, tieLargestCell)

  /** Make `vec_dot` callable from spark.sql in this session. For
    * cluster-wide registration use
    * `spark.sql.extensions=org.apache.spark.sql.graftvec.GraftSqlExtensions`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftvec.GraftVec.registerSql(spark)
}
