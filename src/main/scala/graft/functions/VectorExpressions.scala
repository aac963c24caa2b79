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

/** All `perms` MinHash values of one document in a single expression
  * over its SORTED duplicate-free array<long> shingle-hash set —
  * bank(i) = min over the set of xxhash64(i, h), exactly the value the
  * former `perms` separate `min(xxhash64(lit(i), h))` aggregates
  * produced (pinned in DedupOpsSpec): Spark's xxhash64 folds children
  * through XXH64 with seed 42, so xxhash64(i:int, h:long) =
  * hashLong(h, hashInt(i, 42)) and the per-permutation seeds are
  * precomputed once. Two wins over the aggregate bank (the
  * [[SrpBucketBank]] pattern applied to MinHash — VERDICT r15 #4):
  * the generated update projection of 32 fused min+hash aggregates
  * exceeded HotSpot's JIT size limit (~20% cliff), and min() is
  * duplicate-insensitive, so hashing the DEDUPED set (which the
  * signature row already carries for verification) does strictly less
  * hashing than the raw shingle stream the aggregates consumed. */
case class MinHashBank(child: Expression, perms: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.LongType

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bank"

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(perms)(i => org.apache.spark.sql.catalyst.expressions
      .XXH64.hashInt(i, 42L))

  def evalBank(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = Array.fill(perms)(Long.MaxValue)
    var e = 0
    while (e < n) {
      val h = v.getLong(e)
      var i = 0
      while (i < perms) {
        val x = org.apache.spark.sql.catalyst.expressions
          .XXH64.hashLong(h, seeds(i))
        if (x < out(i)) out(i) = x
        i += 1
      }
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    evalBank(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mhBank", this, classOf[MinHashBank].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalBank($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBank = copy(child = newChild)
}

/** All word-`n`-gram hashes of one document's split word array, in
  * array order — out(i) = xxhash64 (seed 42) of the UTF-8 bytes of
  * `words(i..i+n-1)` joined by single spaces, exactly the value of
  * `xxhash64(concat_ws(" ", w, lead(w,1), …, lead(w,n-1)))` the former
  * window formulation produced (pinned in DedupOpsSpec). The window
  * formulation shuffled the ENTIRE corpus-scale token STRING stream
  * (posexplode → Exchange(doc_id) → Sort → Window(lead×(n-1))) just to
  * pair adjacent words that sit adjacent in the array already (guide
  * §2.4 remove-shuffles-outright: n-gram formation is per-document and
  * needs no exchange at all). Null array elements are skipped exactly
  * like concat_ws skips null children (split() never produces them —
  * defensive parity only). One byte buffer sized to the whole document
  * is allocated per ROW and reused across its n-grams; no per-call
  * mutable state lives on the expression (in local mode one expression
  * instance is shared by concurrent tasks). */
case class NgramHashStream(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StringType}
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash_stream"

  def evalStream(v: ArrayData): ArrayData = {
    val len = v.numElements()
    val cnt = len - n + 1
    if (cnt <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val ws = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var total = 0L
    var i = 0
    while (i < len) {
      val w = v.getUTF8String(i)
      ws(i) = w
      if (w != null) total += w.numBytes
      i += 1
    }
    // whole-doc bytes + one separator per word always bounds any n-gram
    val buf = new Array[Byte](math.min(total + len, Int.MaxValue.toLong).toInt)
    val base = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val out = new Array[Long](cnt)
    var s = 0
    while (s < cnt) {
      var off = 0
      var k = 0
      while (k < n) {
        val w = ws(s + k)
        if (w != null) {
          if (off > 0) { buf(off) = ' '; off += 1 }
          w.writeToMemory(buf, base + off)
          off += w.numBytes
        }
        k += 1
      }
      out(s) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, base, off, 42L)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    evalStream(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramHs", this,
      classOf[NgramHashStream].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalStream($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramHashStream = copy(child = newChild)
}

/** All adjacent-word hash pairs of one document's split word array —
  * out(i) = struct(h1 = xxhash64(words(i)), h12 = xxhash64(words(i),
  * words(i+1))), the exact values t8's bigram-LM stream computed off
  * the window formulation (Spark's multi-child xxhash64 folds left to
  * right: h12 = hashUnsafeBytes(w2, hashUnsafeBytes(w1, 42)) — each
  * word's bytes hashed with the running hash as seed, NOT a concat
  * hash, so this shares no buffer with [[NgramHashStream]]). Same
  * shuffle-removal rationale (guide §2.4): the former
  * posexplode → Exchange → Sort → Window(lead) moved every word string
  * of the corpus through an exchange to pair array-adjacent words.
  * A null word leaves the running hash unchanged, matching xxhash64's
  * null-child semantics (split() never produces nulls). */
case class BigramHashPairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h12", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bigram_hash_pairs"

  def evalPairs(v: ArrayData): ArrayData = {
    val len = v.numElements()
    val cnt = len - 1
    if (cnt <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[org.apache.spark.sql.catalyst.InternalRow])
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val out = new Array[org.apache.spark.sql.catalyst.InternalRow](cnt)
    var i = 0
    var w = v.getUTF8String(0)
    while (i < cnt) {
      val w2 = v.getUTF8String(i + 1)
      val h1 =
        if (w == null) 42L
        else XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      val h12 =
        if (w2 == null) h1
        else XXH64.hashUnsafeBytes(w2.getBaseObject, w2.getBaseOffset, w2.numBytes, h1)
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](h1, h12))
      w = w2
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    evalPairs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bigramHp", this,
      classOf[BigramHashPairs].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalPairs($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BigramHashPairs = copy(child = newChild)
}

/** Occurrence counts of a FIXED term list in one document's split word
  * array — out(i) = |{ j : words(j) == terms(i) }|, exactly
  * `size(filter(words, x => x === lit(term)))` per term (null elements
  * never match, as the === predicate excluded them). One pass over the
  * array replaces |terms| interpreted HOF filter lambdas that each
  * materialized a filtered copy of the array (t7's per-doc term
  * frequencies — the hottest per-row work of the BM25 scan). */
case class TermCountBank(child: Expression, terms: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.{IntegerType, StringType}

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "term_count_bank"

  @transient private lazy val termBytes
      : Array[org.apache.spark.unsafe.types.UTF8String] =
    terms.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  def evalCounts(v: ArrayData): ArrayData = {
    val out = new Array[Int](termBytes.length)
    val n = v.numElements()
    var i = 0
    while (i < n) {
      val w = v.getUTF8String(i)
      if (w != null) {
        var t = 0
        while (t < termBytes.length) {
          if (w.equals(termBytes(t))) out(t) += 1
          t += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    evalCounts(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("termBank", this,
      classOf[TermCountBank].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalCounts($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TermCountBank = copy(child = newChild)
}

/** The first `hexChars` hex digits of md5(string) as an unsigned long —
  * exactly `conv(substring(md5(s.cast("binary")), 1, hexChars), 16,
  * 10).cast("long")`, the md5-prefix rank/bucket idiom shared by
  * t13/sp9/sp2 (and DuckDB's `('0x' || substring(md5(s), 1, k))::BIGINT`
  * on the oracle side). The built-in chain renders the full 32-char hex
  * string, substrings it, and PARSES the decimal back out per row; this
  * reads the leading digest nibbles directly. The digest instance is
  * thread-local (one expression instance is shared by concurrent tasks
  * in local mode). Requires 1 ≤ hexChars ≤ 15 (fits a signed long). */
case class Md5Prefix64(child: Expression, hexChars: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StringType}
  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be in [1, 15], got $hexChars")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  def evalPrefix(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = Md5Prefix64.digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var acc = 0L
    var j = 0
    while (j < hexChars) {
      val b = digest(j >> 1) & 0xff
      val nibble = if ((j & 1) == 0) b >> 4 else b & 0xf
      acc = (acc << 4) | nibble
      j += 1
    }
    acc
  }

  override def nullSafeEval(a: Any): Any =
    evalPrefix(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5Pfx", this, classOf[Md5Prefix64].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $self.evalPrefix($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix64 = copy(child = newChild)
}

object Md5Prefix64 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** Rank-correlation hash bits of one array<float> feature vector over a
  * FIXED index-pair list — bit k = [f(a_k) > f(b_k)], OR-folded into
  * one long: exactly the 64-term `when(element_at(f, a+1) >
  * element_at(f, b+1), 1L<<k)` + bitwiseOR chain it replaces (mm5's
  * perceptual hash — a single projection of 64 comparison expressions
  * is the SrpBucketBank generated-method-size failure shape).
  * Comparisons use Spark's nan-safe float order (GreaterThan's
  * semantics); an out-of-range index yields an unset bit, matching
  * element_at's null → `when`-otherwise-0 behavior. */
case class RankPairBits(child: Expression, pairs: Seq[(Int, Int)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.{FloatType, LongType}

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rank_pair_bits"

  @transient private lazy val as: Array[Int] = pairs.map(_._1).toArray
  @transient private lazy val bs: Array[Int] = pairs.map(_._2).toArray

  def evalBits(v: ArrayData): Long = {
    val n = v.numElements()
    var out = 0L
    var k = 0
    while (k < as.length) {
      val a = as(k); val b = bs(k)
      if (a < n && b < n &&
          org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareFloats(
            v.getFloat(a), v.getFloat(b)) > 0)
        out |= (1L << k)
      k += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any =
    evalBits(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rankBits", this,
      classOf[RankPairBits].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $self.evalBits($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RankPairBits = copy(child = newChild)
}

/** The PPJoin candidate expansion of one posting group in a single
  * expression: input is the group's SORTED array<struct<doc_id:long,
  * n:long, pos:int>>, output every ordered pair (da < db by array
  * order) that passes BOTH classic filters — the length bound
  * 5·min(na,nb) ≥ 4·max(na,nb) and Xiao et al.'s position bound
  * 9·(min(pa,pb) + 1 + min(na−pa−1, nb−pb−1)) ≥ 4·(na+nb) — the exact
  * integer forms the former column filters applied AFTER expansion.
  * The HOF formulation (transform×slice → flatten → explode → filter)
  * materialized the full O(g²) struct array through interpreted
  * lambdas before filtering; this loop allocates only the SURVIVING
  * pairs (guide §3.2 prune-before-expensive), feeding the downstream
  * distinct strictly fewer rows with an identical surviving multiset. */
case class PpjoinCandidatePairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("da", LongType, nullable = false),
    StructField("db", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ppjoin_candidate_pairs"

  def evalPairs(v: ArrayData): ArrayData = {
    val g = v.numElements()
    val ids = new Array[Long](g)
    val ns = new Array[Long](g)
    val ps = new Array[Long](g)
    var i = 0
    while (i < g) {
      val r = v.getStruct(i, 3)
      ids(i) = r.getLong(0); ns(i) = r.getLong(1); ps(i) = r.getInt(2).toLong
      i += 1
    }
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    i = 0
    while (i < g) {
      val na = ns(i); val pa = ps(i)
      var j = i + 1
      while (j < g) {
        val nb = ns(j)
        if (math.min(na, nb) * 5 >= math.max(na, nb) * 4) {
          val pb = ps(j)
          val ov = math.min(pa, pb) + 1L +
            math.min(na - pa - 1L, nb - pb - 1L)
          if (ov * 9L >= (na + nb) * 4L)
            buf += new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](ids(i), ids(j)))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(a: Any): Any =
    evalPairs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ppPairs", this,
      classOf[PpjoinCandidatePairs].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalPairs($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PpjoinCandidatePairs = copy(child = newChild)
}

/** Every ordered pair (da, db) of a SORTED array<long> — the unfiltered
  * sibling of [[PpjoinCandidatePairs]] for n2b's LSH buckets and n5's
  * SRP buckets, where candidate admission is the bucket collision
  * itself. Group size is pre-capped at the call sites
  * (CandidateGroupCap / SrpBucketCap), so the materialized pair array
  * is bounded; the former HOF chain built the same pairs through
  * interpreted transform×slice lambdas plus a flatten copy. */
case class OrderedPairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("da", LongType, nullable = false),
    StructField("db", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ordered_pairs"

  def evalPairs(v: ArrayData): ArrayData = {
    val g = v.numElements()
    val ids = new Array[Long](g)
    var i = 0
    while (i < g) { ids(i) = v.getLong(i); i += 1 }
    val out = new Array[org.apache.spark.sql.catalyst.InternalRow](
      if (g < 2) 0 else g * (g - 1) / 2)
    var k = 0
    i = 0
    while (i < g) {
      var j = i + 1
      while (j < g) {
        out(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](ids(i), ids(j)))
        k += 1; j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    evalPairs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ordPairs", this, classOf[OrderedPairs].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalPairs($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): OrderedPairs = copy(child = newChild)
}

/** Asymmetric-distance dot of one PQ-coded candidate against one of a
  * FIXED query set: adot(qid, codes) = Σ_m qd(qid, m, codes[m]) over
  * the per-query lookup table built at plan construction from the
  * trained codebooks (model-sized: |queries|·M·K doubles riding the
  * expression as a reference object — never plan literals, so the
  * optimizer stops re-processing a 2048-row LocalRelation per
  * invocation, VERDICT r15 #3). Replaces posexplode(codes) ⋈
  * broadcast(qdot) → sum groupBy — an 8× row expansion plus an
  * exchange collapsed into a map-only lookup (guide §2.4). Bit-exact:
  * table entries are the same left-to-right subvector dots the qdot
  * frame computed, and the sum runs m ascending starting FROM the m=0
  * term — the order the former sum() aggregate accumulated (all 8
  * rows of a candidate came from one posexplode in one partition).
  * A qid outside the table yields null (the former inner join dropped
  * such rows; impossible by construction — probes and table derive
  * from the same query frame). */
case class PqAdcDot(qid: Expression, codes: Expression,
    table: Map[Long, Array[Double]], m: Int)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def left: Expression = qid
  override def right: Expression = codes
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val codesOk = codes.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (qid.dataType == LongType && codesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"pq_adc_dot expects (long, array<int>), got " +
        s"(${qid.dataType}, ${codes.dataType})")
  }

  def evalDot(q: Long, c: ArrayData): Any = {
    val t = table.getOrElse(q, null)
    if (t == null) null
    else {
      val k = t.length / m
      var acc = t(c.getInt(0))
      var mm = 1
      while (mm < m) { acc += t(mm * k + c.getInt(mm)); mm += 1 }
      acc
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    evalDot(a.asInstanceOf[Long], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDot].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val res = ctx.freshName("adc")
      s"""
         |Object $res = $self.evalDot($q, $c);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $res).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(qid = newLeft, codes = newRight)
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

  def minHashBankColumn(v: Column, perms: Int): Column =
    ExpressionUtils.column(MinHashBank(ExpressionUtils.expression(v), perms))

  def ngramHashStreamColumn(words: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashStream(ExpressionUtils.expression(words), n))

  def bigramHashPairsColumn(words: Column): Column =
    ExpressionUtils.column(BigramHashPairs(ExpressionUtils.expression(words)))

  def termCountBankColumn(words: Column, terms: Seq[String]): Column =
    ExpressionUtils.column(TermCountBank(ExpressionUtils.expression(words), terms))

  def md5Prefix64Column(s: Column, hexChars: Int): Column =
    ExpressionUtils.column(Md5Prefix64(ExpressionUtils.expression(s), hexChars))

  def rankPairBitsColumn(f: Column, pairs: Seq[(Int, Int)]): Column =
    ExpressionUtils.column(RankPairBits(ExpressionUtils.expression(f), pairs))

  def ppjoinCandidatePairsColumn(ids: Column): Column =
    ExpressionUtils.column(PpjoinCandidatePairs(ExpressionUtils.expression(ids)))

  def orderedPairsColumn(ids: Column): Column =
    ExpressionUtils.column(OrderedPairs(ExpressionUtils.expression(ids)))

  def pqAdcDotColumn(qid: Column, codes: Column,
      table: Map[Long, Array[Double]], m: Int): Column =
    ExpressionUtils.column(PqAdcDot(ExpressionUtils.expression(qid),
      ExpressionUtils.expression(codes), table, m))

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
