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

/** Count of common elements of two SORTED-ASCENDING, duplicate-free
  * array<long> columns — the dedup tier's verification kernel.
  *
  * `size(array_intersect(a, b))` computes the same count but builds a
  * hash set per row (OpenHashSet allocation + boxing inside a
  * CodegenFallback), which at ~10⁵ candidate pairs per corpus was the
  * single hottest stage of the n2/n2b/n2c pipelines. The inputs here
  * are always [[graft.analytics.DedupOps.shingleSets]]-shaped
  * (`sort_array(collect_set(...))`), so a two-pointer merge walk counts
  * the intersection with zero allocation in one tight codegen'd loop.
  * CALLER CONTRACT: both arrays sorted ascending and distinct — equal
  * to array_intersect's count exactly then (pinned in DedupOpsSpec).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** The SRP bucket bank: all `tables` LSH bucket ids of one vector in a
  * single expression — bucket(t) packs the sign bits of `bits`
  * hyperplane projections, planes derived deterministically from the
  * (tables, bits) shape exactly as [[SrpPlanes.planes]] seeds them.
  *
  * The previous formulation built tables×bits separate [[DotProduct]]
  * expressions under one projection; whole-stage codegen inlined all of
  * them into one generated method so large HotSpot REFUSED TO JIT it
  * (DontCompileHugeMethods), and the stage ran in the bytecode
  * interpreter — measured 6.5× slower than even Spark's interpreted
  * expression path at sf0.1. One expression with two tight loops keeps
  * the generated method small and JIT-compiled. Projection sum order is
  * index order, matching the DotProduct chain it replaces bit for bit.
  */
case class SrpBucketBank(child: Expression, tables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.LongType

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bucket_bank"

  @transient private lazy val planes: Array[Array[Double]] =
    SrpPlanes.planes(tables, bits)

  private def bucketsOf(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val p = planes(t * bits + j)
        val n = math.min(dim, p.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(i) * p(i); i += 1 }
        if (acc > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    bucketsOf(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("srpBank", this, classOf[SrpBucketBank].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalBank($v);")
  }

  /** Codegen entry point (kept tiny so the surrounding stage stays
    * JIT-compiled; the loops live in this JIT-friendly method). */
  def evalBank(v: ArrayData): ArrayData = bucketsOf(v)

  override protected def withNewChildInternal(
      newChild: Expression): SrpBucketBank = copy(child = newChild)
}

/** Top-k IVF cells of one vector against a LITERAL codebook — the
  * broadcast-codebook regime's crossJoin ⋈ window/argmax collapsed into
  * one map-only expression: before r15 every IVF query expanded the
  * input ×cells (corpus × codebook rows through a partial aggregate or
  * a per-query window) just to rank a model-sized table that is a pure
  * function of the row. Cosine math is bit-identical to the column
  * formulation it replaces: dot products sum left-to-right, csim =
  * dot / (nrm * ‖c‖) with ‖c‖ = sqrt(dot(c,c)) precomputed once (IEEE
  * doubles are deterministic, so once-per-expression equals
  * once-per-row). Tie rule matches each call site: `tieLargestCell`
  * reproduces `max(struct(csim, cell))` (assignment), `false`
  * reproduces `ORDER BY csim DESC, cell` (probe ranking). Returns the
  * ≤ k best cell ids in rank order. */
case class IvfTopCells(vec: Expression, nrmExpr: Expression,
    cells: Seq[Int], cents: Seq[Seq[Double]], k: Int,
    tieLargestCell: Boolean)
    extends BinaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.IntegerType

  override def left: Expression = vec
  override def right: Expression = nrmExpr
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_top_cells"

  @transient private lazy val ids: Array[Int] = cells.toArray
  @transient private lazy val cv: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cnorm: Array[Double] = cv.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  def evalTop(v: ArrayData, nrm: Double): ArrayData = {
    val m = math.min(k, ids.length)
    val bs = new Array[Double](m)
    val bc = new Array[Int](m)
    var filled = 0
    var ci = 0
    while (ci < ids.length) {
      val c = cv(ci)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * c(i); i += 1 }
      val sim = acc / (nrm * cnorm(ci))
      // cells iterate in ascending id: >= lets an equal-sim LARGER cell
      // displace (max-struct semantics); > keeps the smaller cell
      // (ORDER BY csim DESC, cell semantics). Double.compare reproduces
      // Spark's total order on doubles (NaN greatest, -0.0 < 0.0).
      var pos = filled
      while (pos > 0 && {
        val c = java.lang.Double.compare(sim, bs(pos - 1))
        c > 0 || (tieLargestCell && c == 0)
      }) pos -= 1
      if (pos < m) {
        val last = math.min(filled, m - 1)
        var j = last
        while (j > pos) { bs(j) = bs(j - 1); bc(j) = bc(j - 1); j -= 1 }
        bs(pos) = sim; bc(pos) = ids(ci)
        if (filled < m) filled += 1
      }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bc, filled))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    evalTop(a.asInstanceOf[ArrayData], b.asInstanceOf[Number].doubleValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ivfTop", this, classOf[IvfTopCells].getName)
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.evalTop($v, $s);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfTopCells =
    copy(vec = newLeft, nrmExpr = newRight)
}

/** Deterministic Gaussian hyperplanes for the SRP family — seeded
  * java.util.Random (specified algorithm, identical on every JVM),
  * cached per (tables, bits). Single source of truth for the column
  * formulation and [[SrpBucketBank]]. */
object SrpPlanes {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(Int, Int), Array[Array[Double]]]
  def planes(tables: Int, bits: Int): Array[Array[Double]] =
    cache.getOrElseUpdate((tables, bits), {
      val rnd = new java.util.Random(42)
      Array.fill(tables * bits, 64)(rnd.nextGaussian())
    })
}

object GraftVec {
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sortedIntersectCountColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def srpBucketBankColumn(v: Column, tables: Int, bits: Int): Column =
    ExpressionUtils.column(
      SrpBucketBank(ExpressionUtils.expression(v), tables, bits))

  def ivfTopCellsColumn(v: Column, nrm: Column,
      cents: Seq[(Int, Seq[Double])], k: Int,
      tieLargestCell: Boolean): Column =
    ExpressionUtils.column(IvfTopCells(
      ExpressionUtils.expression(v), ExpressionUtils.expression(nrm),
      cents.map(_._1), cents.map(_._2), k, tieLargestCell))

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
