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

  /** Driver-side BPE reference (Sennrich et al. 2016): greedy
    * left-to-right fusion, most-frequent pair per round, ties broken
    * (count desc, lhs asc, rhs asc) — the sequential formulation the
    * distributed trainer must reproduce exactly. */
  private def fuse(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refBpe(wordFreq: Seq[(String, Long)],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    var streams = wordFreq.map { case (w, f) =>
      (w.split("").toVector, f) }
    val out = scala.collection.mutable
      .ListBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var break = false
    while (r <= rounds && !break) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      streams.foreach { case (syms, f) =>
        (0 until syms.length - 1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) break = true
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((r.toLong, a, b, c))
        streams = streams.map { case (s, f) => (fuse(s, a, b), f) }
        r += 1
      }
    }
    out.toList
  }

  test("t14 BPE trainer == the sequential reference: staged corpus " +
      "with frequency ties and overlapping self-pair runs, then the " +
      "sf corpus, deeper than the gate's rounds (VERDICT r13 #7)") {
    // staged: 'aaaa' exercises the run-parity rule (greedy gives
    // aa+aa, never a+aa+a); 'abab' chains merges; duplicate docs
    // weight frequencies; 'xy'/'xz' tie at equal counts → lex order
    val staged = Seq(
      (0L, "aaaa ab abab"), (1L, "aaaa ab abab"),
      (2L, "aaa banana band"), (3L, "xy xz xy xz")
    ).toDF("doc_id", "text")
    val freq = staged
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expect = refBpe(freq, 12)
    val got = TokenOps.t14BpeMergesOn(spark, staged, 12).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expect,
      s"staged corpus diverged:\n got=$got\n exp=$expect")
    // the parity rule's signature: round 1 on this corpus merges
    // (a,a) with 'aaaa' contributing TWO pairs, 'aaa' one
    assert(got.head._2 == "a" && got.head._3 == "a")
    // the real corpus, deeper than the gate's BpeRounds
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, dir)
    val corpusFreq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expect2 = refBpe(corpusFreq, TokenOps.BpeRounds + 4)
    val got2 = TokenOps
      .t14BpeMergesOn(spark, docs, TokenOps.BpeRounds + 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got2 == expect2,
      s"sf corpus diverged:\n got=$got2\n exp=$expect2")
  }

  test("fuseCol (the map-only aggregate-expression fusion) == the " +
      "sequential greedy fuse on staged edge words") {
    // overlapping self-pair runs, pending-flush re-open, tail pend
    val words = Seq("aaaa", "aaa", "aa", "a", "abab", "aab", "baa",
      "banana", "xyx", "ababab", "bbaabb")
    val cases = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("an", "a"))
    cases.foreach { case (l, r) =>
      val got = words.toDF("w")
        .select(col("w"), TokenOps.fuseCol(split(col("w"), ""), l, r)
          .as("f"))
        .collect().map(x => x.getString(0) -> x.getSeq[String](1)).toMap
      words.foreach { w =>
        val exp = fuse(w.split("").toVector, l, r)
        assert(got(w) == exp, s"fuseCol('$w', $l, $r): ${got(w)} != $exp")
        assert(TokenOps.fuseSeq(w.split("").toIndexedSeq, l, r) == exp,
          s"fuseSeq('$w', $l, $r) diverged from the reference")
      }
    }
  }

  test("incremental pair-count trainer == the full-recount trainer at " +
      "12+ rounds: merges AND final tokenization, staged + sf corpus " +
      "(VERDICT r14 #3)") {
    val staged = Seq(
      (0L, "aaaa ab abab"), (1L, "aaaa ab abab"),
      (2L, "aaa banana band"), (3L, "xy xz xy xz")
    ).toDF("doc_id", "text")
    val sfDocs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    Seq(("staged", staged, 14), ("sf0.001", sfDocs, 12)).foreach {
      case (tag, docs, rounds) =>
        val (mInc, sInc) = TokenOps.bpeTrainOn(spark, docs, rounds)
        val (mFull, sFull) = TokenOps.bpeTrainFullRecount(spark, docs, rounds)
        assert(mInc == mFull,
          s"$tag: merge tables diverged\n inc=$mInc\n full=$mFull")
        val tInc = sInc.select(col("w"), size(col("syms")).as("n"))
          .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
        val tFull = sFull.groupBy("w").count()
          .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
        assert(tInc == tFull, s"$tag: final tokenization diverged")
    }
  }

  test("incremental trainer budget: per-round shuffle moves the " +
      "signed delta + pair state, never the stream — total shuffle " +
      "records a small fraction of the full recount's on a wide " +
      "corpus with a localized merge family") {
    // 3000 inert filler words (alphabet {q,r,s} — their pairs never
    // win) + a heavily weighted tiny family the merges stay inside:
    // per round the delta touches ~4 words while the stream holds
    // 3004; the full recount re-shuffles all ~30k symbol rows per
    // round for the pair count AND five window passes
    val family = (0 until 64).map(_ => "aaaa abab banana band")
      .mkString(" ")
    val filler = (0 until 3000).map { i =>
      ("q" * (1 + i % 7)) + ("r" * (1 + (i / 7) % 7)) +
        ("s" * (1 + (i / 49) % 9)) + "q" * (1 + i / 441)
    }.distinct.mkString(" ")
    val docs = (0 until 8).map(i => (i.toLong, family)) :+
      (8L, filler)
    val df = docs.toDF("doc_id", "text")
    def shuffleRecords(run: () => Unit): Long = {
      val rec = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            rec.addAndGet(m.shuffleWriteMetrics.recordsWritten); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        run()
        // listener bus drains asynchronously — wait until stable
        var prev = -1L
        var tries = 0
        while (rec.get != prev && tries < 50) {
          prev = rec.get; Thread.sleep(100); tries += 1
        }
        rec.get
      } finally { spark.sparkContext.removeSparkListener(l); () }
    }
    val rounds = 8
    val inc = shuffleRecords(() =>
      TokenOps.bpeTrainOn(spark, df, rounds)._2.count())
    val full = shuffleRecords(() =>
      TokenOps.bpeTrainFullRecount(spark, df, rounds)._2.count())
    // both pay the one-time word/pair init (~stream-sized); only the
    // full recount pays stream-sized rounds on top. The margin is
    // deliberately loose (listener noise, AQE) — the regression this
    // pins is "a stream-sized shuffle crept back into the round loop",
    // which shows up as inc ≈ full, an order of magnitude away
    assert(inc < full / 2,
      s"incremental trainer shuffled $inc records vs full recount's " +
        s"$full — per-round work is no longer delta-sized")
  }

  test("deep driver-tier BPE trainer (bpeTrainDeep): == the naive " +
      "reference and the distributed trainer where they overlap, and " +
      "== the reference at 300 rounds over the 40k-word corpus — the " +
      "32k-merge production shape (one distributed aggregate + an " +
      "indexed in-memory merge loop)") {
    val staged = Seq(
      (0L, "aaaa ab abab"), (1L, "aaaa ab abab"),
      (2L, "aaa banana band"), (3L, "xy xz xy xz")
    ).toDF("doc_id", "text")
    val freq = staged
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expect = refBpe(freq, 14)
    assert(TokenOps.bpeTrainDriver(freq, 14) == expect,
      "indexed driver trainer diverged on the tie/overlap corpus")
    assert(TokenOps.bpeTrainDeep(spark, staged, 14) == expect,
      "the aggregate+truncate end-to-end path diverged")
    assert(TokenOps.t14BpeMergesOn(spark, staged, 14).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq == expect,
      "distributed and driver tiers disagree")
    // the sf corpus
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val corpusFreq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(TokenOps.bpeTrainDriver(corpusFreq, 12) ==
      refBpe(corpusFreq, 12))
    // DEPTH: 300 rounds over the wide 40k-distinct-word corpus — the
    // regime the inverted index exists for (the naive reference
    // recounts every word every round); affected-word work keeps the
    // indexed loop fast while results stay bit-identical
    val wideFreq = wide
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(wideFreq.size > 40000)
    val t0 = System.nanoTime()
    val deep = TokenOps.bpeTrainDriver(wideFreq, 300)
    val indexedSec = (System.nanoTime() - t0) / 1e9
    val expDeep = refBpe(wideFreq, 300)
    assert(deep == expDeep,
      s"indexed trainer diverged at depth (first off: ${deep.zip(expDeep)
        .find(x => x._1 != x._2)})")
    assert(deep.size >= 100, s"merge space exhausted at ${deep.size}")
    info(f"indexed 300-round train over ${wideFreq.size} words: " +
      f"$indexedSec%.2fs")
  }

  test("t14c apply: held-out words tokenize under the FROZEN merges — " +
      "never-merged pairs pass through at character count, and the " +
      "gate query matches the driver-side reference (VERDICT r14 #1)") {
    // train slice: doc_id % 3 != 0; held-out doc 0 mixes trained
    // words, a partially-mergeable word, and words whose symbols the
    // training corpus never saw (zz qq) — those must bill at char
    // count, not vanish (the r14 inner-join hole)
    val docs = Seq(
      (0L, "aaaa abab zz qq banana zqzb"),
      (1L, "aaaa ab abab banana"),
      (2L, "aaa banana band ab ab"),
      (3L, "zz banana aaaa"), // held out too (3 % 3 == 0)
      (4L, "ab abab aaaa aaaa")
    ).toDF("doc_id", "text")
    val trainFreq = docs.filter(col("doc_id") % 3 =!= 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val rounds = 6
    val merges = refBpe(trainFreq, rounds).map(m => (m._2, m._3))
    def toksOf(w: String): Long = {
      var s = w.split("").toVector
      merges.foreach { case (a, b) => s = fuse(s, a, b) }
      s.length.toLong
    }
    val expect = docs.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect().map { r =>
        val ws = r.getString(1).split(' ').filter(_.nonEmpty)
        r.getLong(0) -> ((ws.length.toLong, ws.map(toksOf).sum))
      }.toMap
    val got = TokenOps.t14cBpeApplyOn(spark, docs, rounds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, s"held-out billing diverged:\n got=$got\n " +
      s"exp=$expect")
    // the never-merged words bill at character count: doc 0 must
    // count zz=2, qq=2, zqzb=4 — verify via the reference core
    assert(TokenOps.applyMerges("zz", merges).length == 2)
    assert(TokenOps.applyMerges("zqzb", merges).length == 4)
    // a fully-trained word still compresses on the held-out side
    assert(toksOf("aaaa") < 4, "staging bug: (a,a) never merged")
    // and the sf corpus end-to-end (gate shape at gate rounds)
    val dir = "/root/testdata/sf0.001"
    val sfDocs = graft.core.Tables.documents(spark, dir)
    val sfTrainFreq = sfDocs.filter(col("doc_id") % 3 =!= 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val sfMerges = refBpe(sfTrainFreq, TokenOps.BpeRounds)
      .map(m => (m._2, m._3))
    val memo = scala.collection.mutable.Map.empty[String, Long]
    def sfToks(w: String): Long = memo.getOrElseUpdate(w, {
      var s = w.split("").toVector
      sfMerges.foreach { case (a, b) => s = fuse(s, a, b) }
      s.length.toLong
    })
    val sfExpect = sfDocs.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect().flatMap { r =>
        val ws = r.getString(1).split(' ').filter(_.nonEmpty)
        if (ws.isEmpty) None
        else Some(r.getLong(0) -> ((ws.length.toLong, ws.map(sfToks).sum)))
      }.toMap
    val sfGot = TokenOps.t14cBpeApply(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sfGot == sfExpect, {
      val off = sfExpect.keySet.union(sfGot.keySet)
        .filter(k => sfExpect.get(k) != sfGot.get(k)).take(3)
      s"sf held-out billing diverged at ${off.map(k =>
        (k, sfExpect.get(k), sfGot.get(k)))}"
    })
  }

  test("t14b tokenize == applying the reference merges in rank order " +
      "per word, summed per document") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, dir)
    val corpusFreq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = refBpe(corpusFreq, TokenOps.BpeRounds)
    val tokMemo = scala.collection.mutable.Map.empty[String, Long]
    def tokensOf(w: String): Long = tokMemo.getOrElseUpdate(w, {
      var s = w.split("").toVector
      merges.foreach { case (_, a, b, _) => s = fuse(s, a, b) }
      s.length.toLong
    })
    val expect = docs.select("doc_id", "text").collect().map { r =>
      val ws = r.getString(1).split(' ').filter(_.nonEmpty)
      r.getLong(0) -> ((ws.length.toLong, ws.map(tokensOf).sum))
    }.filter(_._2._1 > 0).toMap
    val got = TokenOps
      .t14bBpeTokenizeOn(spark, docs, TokenOps.BpeRounds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, {
      val off = expect.keySet.union(got.keySet)
        .filter(k => expect.get(k) != got.get(k)).take(3)
      s"per-doc BPE billing diverged at ${off.map(k =>
        (k, expect.get(k), got.get(k)))}"
    })
    // compression sanity: merges only ever SHRINK a word's stream
    assert(got.values.forall { case (ws, bpe) => bpe >= ws },
      "a word tokenized below 1 token")
  }
}
