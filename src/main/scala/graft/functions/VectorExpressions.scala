/** Native Catalyst expression for the embedding hot path (SURVEY.md
  * §7.3: custom Expression only where built-ins genuinely fall short).
  *
  * Lives under org.apache.spark.sql.* because Catalyst's expression SPI
  * (AbstractDataType, ExpressionUtils.column) is private[sql]; this is
  * the established pattern for third-party expression libraries. The
  * public entry point is graft.functions.VectorFunctions.
  */
package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Fused dot product over two array<double> columns.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` computes the same value
  * via two higher-order functions — interpreted lambdas plus a
  * materialized intermediate array per row, and HOFs block whole-stage
  * codegen. This expression emits one tight loop in generated code,
  * keeping the surrounding projection inside WholeStageCodegen. Sum
  * order is left-to-right, matching both the HOF formulation and
  * DuckDB's list_dot_product, so oracle parity is unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftVec {
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  private[sql] val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  /** Expose `vec_dot` to SQL in an existing session (temp function —
    * the notebook/REPL path). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", dotBuilder, "built-in")
}

/** Cluster-deployment face of the same registration: set
  * `spark.sql.extensions=org.apache.spark.sql.graftvec.GraftSqlExtensions`
  * and every session (including thrift/connect ones the app never
  * touches) resolves `vec_dot` natively. Shares the exact builder the
  * temp-function path uses, so one behavior test covers both.
  *
  * The same extension installs the store catalog's native-read rule
  * ([[graft.ops.GraftNativeReadRule]]): catalog-resolved store tables
  * rewrite during analysis to the delete-aware `GraftFileIndex` plan,
  * upgrading catalog SQL from the V1Scan bridge to native file scans
  * (codegen, vectorized reader, runtime filters). Sessions without the
  * extension keep the bridge — correctness never depends on it. */
class GraftSqlExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "vec_dot"),
      GraftVec.dotBuilder))
    ext.injectResolutionRule(session =>
      new graft.ops.GraftNativeReadRule(session))
    // SQL MERGE INTO / UPDATE for graft catalog tables (the Delta-style
    // command rewrite — see graft.ops.GraftDml). Resolution rules run
    // before Spark's RewriteUpdateTable/RewriteMergeIntoTable would
    // refuse the non-row-level table.
    ext.injectResolutionRule(session =>
      new graft.ops.GraftDmlRule(session))
    // CREATE/REFRESH/DROP MATERIALIZED VIEW over the store's
    // incremental views (graft.ops.MatViewSql) — statements stock
    // Spark cannot parse are claimed, everything else delegates.
    ext.injectParser((_, delegate) =>
      new graft.ops.GraftSqlParser(delegate))
  }
}
