package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Deployment-width tokenizer vocabulary (VERDICT r10 ask #7): the
  * 32k-entry vocab build stays a bounded driver truncate + broadcast,
  * selection stays deterministic under frequency ties, and the t11 /
  * sp3b pipelines agree with the driver-side reference recurrence at
  * full width. The sf corpus has a ~31-word closed vocabulary, so this
  * spec stages a corpus wide enough (40k+ distinct words) that the 32k
  * truncate actually cuts. */
class TokenVocabSpec extends SparkSuite {
  import spark.implicits._

  /** 4000 docs: 10 head words in every doc (frequency 4000), plus 10
    * singleton tail words per doc — 40,010 distinct words. */
  private lazy val wide: DataFrame = {
    val heads = (0 until 10).map(h => s"head$h").mkString(" ")
    (0 until 4000).map { i =>
      val tail = (0 until 10).map(k => s"w${i * 10 + k}").mkString(" ")
      (i.toLong, s"$heads $tail")
    }.toDF("doc_id", "text")
  }

  test("32k vocab: bounded truncate, deterministic tie-break, bounded broadcast") {
    val k = TokenOps.ProductionVocabSize
    val vocab = TokenOps.buildVocab(wide, k)
    assert(vocab.length == k)
    // the 10 head words dominate by frequency and must all be kept
    (0 until 10).foreach(h => assert(vocab.contains(s"head$h")))
    // ties at frequency 1 break by word ascending: the kept tail is
    // exactly the lexicographically smallest 32758 singleton words
    val expectedTail = (0 until 40000).map(i => s"w$i").sorted.take(k - 10)
    assert(vocab.filterNot(_.startsWith("head")).sorted == expectedTail)
    // broadcast payload is K strings, bounded by K — not corpus size
    val bytes = vocab.map(_.length.toLong + 8L).sum
    assert(bytes < 4L * 1024 * 1024, s"vocab payload $bytes bytes")
    // deterministic: a rebuild yields the identical sequence
    assert(TokenOps.buildVocab(wide, k) == vocab)
  }

  test("t11 at 32k agrees with the driver-side reference recurrence") {
    val k = TokenOps.ProductionVocabSize
    val vocab = TokenOps.buildVocab(wide, k)
    val set = vocab.toSet
    val maxLen = vocab.map(_.length).foldLeft(1)(math.max)
    val got = TokenOps.t11WordpieceOn(spark, wide, k).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = wide.collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, text) =>
      val ws = text.split(' ')
      val exp = ws.map(w => TokenOps.wordPieces(w, set, maxLen).toLong).sum
      assert(got(id) == ((ws.length.toLong, exp)),
        s"doc $id: got ${got(id)}, expected (${ws.length}, $exp)")
    }
    // an OUT-of-vocab tail word must decompose (expansion > 1 token)
    // for at least the docs whose singletons got truncated away
    val cut = texts.collect { case (id, t)
        if t.split(' ').exists(w => !set.contains(w)) => id }
    assert(cut.nonEmpty, "staging bug: nothing fell outside the 32k vocab")
    cut.foreach(id => assert(got(id)._2 > got(id)._1))
  }

  test("t11b gate query: the corpus-derived wide staging cuts at 32k " +
      "and agrees with the driver-side reference (VERDICT-r11 #6)") {
    val dir = "/root/testdata/sf0.001"
    val staged = TokenOps.wideCorpusOf(
      graft.core.Tables.documents(spark, dir))
    // 500 docs × 80 singleton tails + 10 heads = 40,010 distinct words
    val distinct = staged.select(explode(split(col("text"), " ")))
      .distinct().count()
    assert(distinct > TokenOps.ProductionVocabSize,
      s"staging bug: only $distinct distinct words — truncate is moot")
    val k = TokenOps.ProductionVocabSize
    val vocab = TokenOps.buildVocab(staged, k)
    assert(vocab.length == k)
    val set = vocab.toSet
    val maxLen = vocab.map(_.length).foldLeft(1)(math.max)
    val got = TokenOps.t11bWordpieceWide(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = staged.collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.size == texts.length)
    var cut = 0
    texts.foreach { case (id, text) =>
      val ws = text.split(' ')
      val exp = ws.map(w => TokenOps.wordPieces(w, set, maxLen).toLong).sum
      assert(got(id) == ((ws.length.toLong, exp)), s"doc $id")
      if (exp > ws.length) cut += 1
    }
    // the truncate genuinely cut: some docs decompose at full width
    assert(cut > 0, "no doc fell outside the 32k vocab")
  }

  test("sp3b token packing at 32k: budgets hold under the wide vocab") {
    val k = TokenOps.ProductionVocabSize
    val packs = TokenOps.sp3bTokenPackOn(spark, wide.limit(200), k)
    val rows = packs.collect()
    assert(rows.nonEmpty)
    // deterministic across runs
    val again = TokenOps.sp3bTokenPackOn(spark, wide.limit(200), k).collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }
}
