package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** T1-T4 text-analysis semantics. The testdata documents are synthetic
  * English-ish token streams for every `lang` value, so language-ID
  * behavior is asserted on crafted multilingual fixtures here; the
  * testdata run is covered by the DuckDB oracle. */
class TextOpsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def fixtureDocs = {
    import spark.implicits._
    Seq(
      (1L, "der hund und die katze sind schön und ich bin hier"),
      (2L, "the quick brown fox and the lazy dog are running and jumping"),
      (3L, "le chat et les chiens sont dans les jardins que nous aimons"),
      (4L, " el perro y los gatos están en la casa que hemos comprado"),
      (5L, "我是在这里的人了我的朋友是在那里"),
    ).toDF("doc_id", "text")
  }

  test("t1 language ID recovers the language of real-language fixtures") {
    val rows = TextOps.t1LangIdOn(fixtureDocs).collect().sortBy(_.getLong(0))
    val expected = Seq("de", "en", "fr", "es", "zh")
    rows.zip(expected).foreach { case (r, want) =>
      assert(r.getString(1) == want,
        s"doc ${r.getLong(0)}: predicted ${r.getString(1)}, want $want")
    }
  }

  test("t1 on testdata: one prediction per doc, scores non-negative") {
    val df = TextOps.t1LangId(spark, dir)
    val n = graft.core.Tables.documents(spark, dir).count()
    assert(df.count() == n)
    assert(df.filter(col("pred_lang").isNull).count() == 0)
    assert(df.filter(col("score_en") < 0).count() == 0)
  }

  test("t2 quality: ratios in [0,1], quality in [0,1]; punctuation lowers score") {
    val df = TextOps.t2QualityScore(spark, dir)
    assert(df.filter(
      col("punct_ratio") < 0 || col("punct_ratio") > 1 ||
      col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
      col("quality") < 0 || col("quality") > 1).count() == 0)

    import spark.implicits._
    val clean = "the cat sat on the mat and looked at the dog " * 5
    val noisy = "@#$% !!! ??? %%% " * 10
    val out = TextOps.t2QualityScoreOn(
      Seq((1L, clean), (2L, noisy)).toDF("doc_id", "text"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Double]("quality") > out(1).getAs[Double]("quality"))
  }

  test("t3 token stats: distinct <= ws tokens; subword splits punctuation") {
    val df = TextOps.t3TokenStats(spark, dir)
    assert(df.filter(col("distinct_tokens") > col("ws_tokens")).count() == 0)
    assert(df.filter(col("type_token_ratio") > 1.0).count() == 0)

    import spark.implicits._
    val out = TextOps.t3TokenStatsOn(
      Seq((1L, "don't stop-me now123")).toDF("doc_id", "text")).head()
    assert(out.getAs[Long]("ws_tokens") == 3)
    // don | ' | t | stop | - | me | now | 123
    assert(out.getAs[Long]("subword_tokens") == 8)
  }

  test("t4 fingerprint: identical text same fp; order flips doc_fp not bag_fp") {
    import spark.implicits._
    val out = TextOps.t4FingerprintOn(Seq(
        (1L, "alpha beta gamma"),
        (2L, "alpha beta gamma"),
        (3L, "gamma beta alpha"),
      ).toDF("doc_id", "text")).collect().sortBy(_.getLong(0))
    assert(out(0).getLong(1) == out(1).getLong(1)) // identical text
    assert(out(0).getLong(1) != out(2).getLong(1)) // order-sensitive
    assert(out(0).getLong(2) == out(2).getLong(2)) // bag identity order-free
  }

  test("t4 on testdata: exact duplicates share fingerprints") {
    val fp = TextOps.t4Fingerprint(spark, dir)
    val d = graft.core.Tables.documents(spark, dir).join(fp, "doc_id")
      .groupBy("text").agg(countDistinct("doc_fp").as("n"))
    assert(d.filter("n > 1").count() == 0)
  }

  test("t6 repetition: hand-computed signals on known documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a a a a"),      // 4 words, 1 distinct; bigrams: "a a" x3
      (2L, "a b c d"),      // all distinct; 3 distinct bigrams
      (3L, "x y x y x"),    // 5 words, 2 distinct; "x y" x2, "y x" x2
    ).toDF("doc_id", "text")
    val out = graft.analytics.TextOps.t6RepetitionOn(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    //            n_words, n_distinct, uniq_bp, top_bg, n_bg, rep_bp
    assert(out(1L) == (4L, 1L, 2500L, 3L, 3L, 10000L))
    assert(out(2L) == (4L, 4L, 10000L, 1L, 3L, 3333L))
    assert(out(3L) == (5L, 2L, 4000L, 2L, 4L, 5000L))
  }

  test("sp4 epoch shuffle: epochs permute differently, reruns identically") {
    import org.apache.spark.sql.functions._
    val out = graft.analytics.TextOps.sp4BatchShuffle(spark, dir).collect()
    // deterministic across runs (resumable training)
    assert(graft.analytics.TextOps.sp4BatchShuffle(spark, dir)
      .collect().toSeq == out.toSeq)
    // each epoch covers the whole corpus exactly once
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    val perEpoch = out.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(perEpoch.values.forall(_ == nDocs), perEpoch.toString)
    // and presents it in a DIFFERENT order: at least one (shard, batch)
    // membership checksum differs between epochs
    val sums = out.groupBy(_.getLong(0)).view.mapValues(
      _.map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(4)).toMap).toMap
    assert(sums(0L) != sums(1L), "epoch 1 identical to epoch 0")
    // no batch exceeds the configured size
    assert(out.forall(_.getLong(3) <= graft.analytics.TextOps.ShuffleBatchDocs))
  }

  test("sp5 mixture: composition exactly proportional, maximal, deterministic") {
    import org.apache.spark.sql.functions._
    val parts = graft.analytics.TextOps.MixtureParts.toMap
    val out = graft.analytics.TextOps.sp5MixtureSample(spark, dir).collect()
    val byLang = out.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    // exact proportionality: every domain contributes k·parts_d
    val ks = byLang.map { case (l, n) => n / parts(l) }
    assert(ks.toSet.size == 1, s"not proportional: $byLang")
    assert(byLang.forall { case (l, n) => n == ks.head * parts(l) })
    // maximality: k is the bottleneck domain's available DIV parts
    val avail = graft.core.Tables.documents(spark, dir)
      .filter(col("lang").isin(parts.keys.toSeq: _*))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ks.head == avail.map { case (l, n) => n / parts(l) }.min)
    // deterministic across runs
    assert(graft.analytics.TextOps.sp5MixtureSample(spark, dir)
      .collect().toSeq == out.toSeq)
  }

  test("t8 bigram LM: hand-computed scores on a known corpus") {
    import spark.implicits._
    // corpus: "a b a b", "a b c". Bigrams: (a,b)x3, (b,a)x1, (b,c)x1.
    // Left-unigram counts: a->3, b->2. Vocab = {a,b,c} -> V=3.
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = graft.analytics.TextOps.t8BigramLmOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def bp(c12: Long, c1: Long): Long =
      math.round(math.log((c12 + 1.0) / (c1 + 3.0)) * 10000)
    val ab = bp(3, 3); val ba = bp(1, 2); val bc = bp(1, 2)
    // doc 1: a b, b a, a b -> 2*ab + ba over 3 bigrams
    assert(out(1L)._1 == 3 && out(1L)._2 == 2 * ab + ba)
    assert(out(1L)._3 ==
      BigDecimal((2 * ab + ba) / 3.0).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 2: a b, b c
    assert(out(2L)._1 == 2 && out(2L)._2 == ab + bc)
    // single-word docs produce no row
    val single = graft.analytics.TextOps.t8BigramLmOn(
      Seq((9L, "solo")).toDF("doc_id", "text"))
    assert(single.count() == 0)
  }

  test("sp5 mixture with a zero-doc domain is EMPTY (k bottlenecks at 0)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // drop every zh doc into a temp corpus: exact composition is then
    // unachievable, so the largest exactly-proportional sample is empty
    val tmp = java.nio.file.Files.createTempDirectory("sp5-zero")
    graft.core.Tables.documents(spark, dir)
      .filter(col("lang") =!= "zh")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    assert(graft.analytics.TextOps
      .sp5MixtureSample(spark, tmp.toString).count() == 0L)
  }

  test("t9 piiScrub: hand corpus — counts per class, redaction order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail alice.smith+x@corp.example.org today"),
      (2L, "ssn 123-45-6789 and phone 555-123-4567"),
      (3L, "hosts 10.0.0.1 and 192.168.255.3"),
      (4L, "none here"),
      (5L, "two mails a@b.co c_d%e@f-g.io and ip 8.8.8.8"),
    ).toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs, "text")
      .select("doc_id", "n_email", "n_ssn", "n_phone", "n_ip", "redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L, "mail [EMAIL] today")))
    // the SSN's 3-2-4 shape never bleeds into the phone's 3-3-4
    assert(out(2L) == ((0L, 1L, 1L, 0L, "ssn [SSN] and phone [PHONE]")))
    assert(out(3L) == ((0L, 0L, 0L, 2L, "hosts [IP] and [IP]")))
    assert(out(4L) == ((0L, 0L, 0L, 0L, "none here")))
    assert(out(5L) == ((2L, 0L, 0L, 1L,
      "two mails [EMAIL] [EMAIL] and ip [IP]")))
  }

  test("t9 on testdata: every doc row present, redacted text PII-free") {
    import org.apache.spark.sql.functions._
    val df = TextOps.t9PiiRedact(spark, dir)
    val n = graft.core.Tables.documents(spark, dir).count()
    assert(df.count() == n)
    // re-scrubbing the redacted text finds nothing: redaction is total
    val rescrub = TextOps.piiScrub(
      df.select(col("doc_id"), col("redacted")), "redacted")
    assert(rescrub.filter(col("n_email") + col("n_ssn") + col("n_phone") +
      col("n_ip") > 0).count() == 0)
    // and the injection really exercised every class
    val tot = df.agg(sum("n_email"), sum("n_ssn"), sum("n_phone"),
      sum("n_ip")).head()
    (0 to 3).foreach(i => assert(tot.getLong(i) > 0,
      s"pattern class $i never fired — vacuous oracle"))
  }

  test("t10 OOV: every doc scored, bp arithmetic exact, vocab boundary " +
      "is relative (integer test)") {
    val rows = TextOps.t10OovRate(spark, dir).collect()
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (nTok, nOov, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nOov <= nTok)
      assert(bp == nOov * 10000 / nTok) // floor division, both engines
      assert(bp >= 0 && bp <= 10000)
    }
    // the testdata corpus has at least one sub-threshold word (df ≈ 5%
    // of docs), so OOV is a real signal here, not identically zero
    assert(rows.exists(_.getLong(2) > 0), "no OOV tokens found")
    // and the vocabulary keeps the common words: most tokens in-vocab
    val tot = rows.map(_.getLong(1)).sum.toDouble
    val oov = rows.map(_.getLong(2)).sum.toDouble
    assert(oov / tot < 0.5, s"vocabulary collapsed: ${oov / tot}")
  }

  test("sp6 curriculum: every epoch window holds the mixture ratio") {
    import org.apache.spark.sql.functions._
    val df = sp6Cached
    // one row per (mixture-domain) doc
    val n = graft.core.Tables.documents(spark, dir).count()
    assert(df.count() == n)
    // within every COMPLETE epoch, each domain contributes exactly its
    // parts weight (incomplete tail epochs may hold fewer)
    val parts = TextOps.MixtureParts.toMap
    val perEpoch = df.groupBy("epoch", "lang").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val full = df.groupBy("lang").agg(max("epoch").as("maxe")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    parts.foreach { case (lang, p) =>
      (0L until full(lang)).foreach { e =>
        assert(perEpoch((e, lang)) == p.toLong,
          s"epoch $e lang $lang: ${perEpoch((e, lang))} != $p")
      }
    }
    // slots within (epoch, lang) are 0..k-1, no duplicate positions
    assert(df.groupBy("epoch", "lang", "slot").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("sp6 is append-stable: a grown corpus only extends the tail") {
    import org.apache.spark.sql.functions._
    // drop the hash-ranked TAIL of each domain (rank > 60) — sp6 on the
    // truncated corpus must equal sp6 on the full corpus restricted to
    // the surviving docs with epoch below the truncation point
    val keepPerLang = 60
    val tmp = java.nio.file.Files.createTempDirectory("sp6-grow")
    val hashRank = conv(substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(hashRank, col("doc_id"))
    graft.core.Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= keepPerLang).drop("rk")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val small = TextOps.sp6CurriculumInterleave(spark, tmp.toString)
      .collect().toSet
    val fullRestricted = sp6Cached
      .filter(col("epoch") < TextOps.MixtureParts.map {
        case (_, p) => keepPerLang / p }.min)
      .collect().toSet
    // the small-corpus schedule agrees with the full one on every
    // position below the guaranteed-complete prefix
    assert(fullRestricted.subsetOf(small))
  }

  private lazy val sp6Cached =
    TextOps.sp6CurriculumInterleave(spark, dir).cache()

  test("sp9 DSIR: hand-computed bucket scores, weights, and the " +
      "above-mean selection boundary") {
    import spark.implicits._
    // 'aaa' hashes to bucket 188, 'bbb' to 248 (distinct): target (en)
    // docs lean 'aaa', so s_aaa = ((5+1)*10000) DIV (6+1) = 8571 and
    // s_bbb = ((1+1)*10000) DIV (6+1) = 2857
    val docs = Seq(
      (1L, "en", "aaa aaa aaa"),
      (2L, "en", "aaa aaa bbb"),
      (3L, "de", "bbb bbb bbb"),
      (4L, "de", "aaa bbb bbb"),
    ).toDF("doc_id", "lang", "text")
    val rows = TextOps.sp9DsirSelectOn(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows(1L) == ((3L, 3L * 8571, true)))
    assert(rows(2L) == ((3L, 2L * 8571 + 2857, true)))
    assert(rows(3L) == ((3L, 3L * 2857, false)))
    assert(rows(4L) == ((3L, 8571 + 2L * 2857, false)))
  }

  test("sp9 boundary: DECIMAL(38,0) lanes are exact past int64, where " +
      "the r12 BIGINT cross-multiply cannot even evaluate") {
    import spark.implicits._
    // (weight, corpus_words, total_weight, n_words) staged so the
    // products straddle int64: at a 100 TB corpus (~2e13 words,
    // total_weight ~ 2e17) a 1e4-word document's bar product is ~2e21 —
    // rows 1-2 model exactly that regime. Rows 3-4 pin the tight
    // sub-epsilon comparisons just UNDER int64 where both forms agree.
    val edge = Seq(
      (4000000000L, 4000000000L, 1000000L, 1000L), // lhs 1.6e19 > int64
      (1000000L, 1000L, 4000000000L, 4000000000L), // rhs 1.6e19 > int64
      (3000000000L, 3000000000L, 3000000001L, 3000000000L), // false by 3e9
      (3000000001L, 3000000000L, 3000000000L, 3000000000L), // true by 3e9
      (2L, 3L, 1L, 5L),
    ).toDF("weight", "corpus_words", "total_weight", "n_words")
    val got = edge.select(col("*"),
      TextOps.dsirSelected(col("weight"), col("corpus_words"),
        col("total_weight"), col("n_words")).as("sel")).collect()
    got.foreach { r =>
      val ref = BigInt(r.getLong(0)) * BigInt(r.getLong(1)) >=
        BigInt(r.getLong(2)) * BigInt(r.getLong(3))
      assert(r.getBoolean(4) == ref,
        s"decimal boundary disagrees with BigInt reference on $r")
    }
    // the r12 int64 form is not merely imprecise at this scale — under
    // ANSI (this session's default) it kills the job outright
    val ex = intercept[Exception] {
      edge.select((col("weight") * col("corpus_words") >=
        col("total_weight") * col("n_words")).as("sel")).collect()
    }
    def mentionsOverflow(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("ARITHMETIC_OVERFLOW")) ||
        mentionsOverflow(t.getCause))
    assert(mentionsOverflow(ex), s"expected int64 overflow, got $ex")
  }

  test("t13 classifier: hand-pinned logits (independent md5 recompute) " +
      "and the label boundary") {
    import spark.implicits._
    // recomputed outside Spark: bucket(w)=md5(w)[:4] % 1024,
    // wgt(b)=md5("w"+b)[:4] % 2001 - 1000 ->
    //   "aaa bbb aaa" sums to -1011 (label false),
    //   "ccc ddd" to 1672 (label true)
    val docs = Seq((1L, "aaa bbb aaa"), (2L, "ccc ddd"))
      .toDF("doc_id", "text")
    val got = TextOps.t13ClassifierScoreOn(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toList
    assert(got == List((1L, 3L, -1011L, false), (2L, 2L, 1672L, true)))
  }

  test("t13 on testdata: one score per doc, label == (logit >= 0), both " +
      "classes inhabited, weights bounded") {
    val df = TextOps.t13ClassifierScore(spark, dir).cache()
    try {
      assert(df.count() == graft.core.Tables.documents(spark, dir).count())
      assert(df.filter((col("logit") >= 0L) =!= col("label")).count() == 0)
      // |logit| can never exceed n_words * max|weight|
      assert(df.filter(abs(col("logit")) > col("n_words") * 1000L)
        .count() == 0)
      assert(df.filter(col("label")).count() > 0)
      assert(df.filter(!col("label")).count() > 0)
    } finally { df.unpersist(); () }
  }

  test("sp10 perplexity band: tails always dropped, ties share fate, " +
      "and every flag equals exact rank arithmetic over the histogram") {
    val df = TextOps.sp10PplBand(spark, dir).cache()
    try {
      val n = df.count()
      val mn = df.agg(min(col("score_bp"))).collect()(0).getLong(0)
      val mx = df.agg(max(col("score_bp"))).collect()(0).getLong(0)
      // the extreme score groups have nothing strictly below/above —
      // they can never clear the band, whatever the corpus
      assert(df.filter(col("score_bp") === mn && col("selected"))
        .count() == 0)
      assert(df.filter(col("score_bp") === mx && col("selected"))
        .count() == 0)
      // tie-stability: equal scores share fate by construction
      assert(df.groupBy(col("score_bp"))
        .agg(countDistinct(col("selected")).as("k"))
        .filter(col("k") > 1).count() == 0)
      // exact recomputation of the rule from the integer histogram
      val hist = df.groupBy(col("score_bp")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      df.select(col("doc_id"), col("score_bp"), col("selected")).collect()
        .foreach { r =>
          val s = r.getLong(1)
          val below = hist.collect { case (v, c) if v < s => c }.sum
          val above = hist.collect { case (v, c) if v > s => c }.sum
          val ref = below * TextOps.PplBandDecile >= n &&
            above * TextOps.PplBandDecile >= n
          assert(r.getBoolean(2) == ref,
            s"doc ${r.getLong(0)} score $s: got ${r.getBoolean(2)}, " +
              s"rank arithmetic says $ref")
        }
      // the band is substantive: most of the corpus survives, not all
      val sel = df.filter(col("selected")).count()
      assert(sel > n / 2 && sel < n, s"band kept $sel of $n")
    } finally { df.unpersist(); () }
  }

  test("sp9 on testdata: every doc scored once, weights positive, the " +
      "selection bar is exactly the corpus per-word mean") {
    val df = TextOps.sp9DsirSelect(spark, dir).cache()
    try {
      val n = graft.core.Tables.documents(spark, dir).count()
      assert(df.count() == n)
      assert(df.filter(col("weight") <= 0).count() == 0)
      // recompute the bar and check every row's flag against it
      val tot = df.agg(sum(col("weight")).as("tw"),
        sum(col("n_words")).as("cw")).collect()(0)
      val (tw, cw) = (tot.getLong(0), tot.getLong(1))
      val wrong = df.filter(
        (col("weight") * cw >= lit(tw) * col("n_words")) =!= col("selected"))
      assert(wrong.count() == 0)
      // the synthetic corpus mixes one shared vocabulary, but per-doc
      // bucket mixes still spread: both sides of the bar are inhabited
      assert(df.filter(col("selected")).count() > 0)
      assert(df.filter(!col("selected")).count() > 0)
    } finally { df.unpersist(); () }
  }

  test("md5Prefix64 == the conv(substring(md5(...))) chain it replaced " +
      "(the r16 md5-prefix kernel, 4 and 8 hex chars)") {
    import org.apache.spark.sql.functions._
    val words = graft.core.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
    for (k <- Seq(4, 8)) {
      val bad = words.select(
          conv(substring(md5(col("w").cast("binary")), 1, k), 16, 10)
            .cast("long").as("ref"),
          graft.functions.VectorFunctions.md5Prefix64(col("w"), k).as("got"))
        .filter(col("ref") =!= col("got"))
      assert(bad.count() == 0, s"k=$k mismatch")
    }
    // and on rendered numeric ids (the sp2 rank shape)
    val ids = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").cast("string").as("s"))
    val badIds = ids.select(
        conv(substring(md5(col("s").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("ref"),
        graft.functions.VectorFunctions.md5Prefix64(col("s"), 8).as("got"))
      .filter(col("ref") =!= col("got"))
    assert(badIds.count() == 0)
  }

  test("termCountBank == size(filter(words, _ === term)) per term " +
      "(the r16 t7 term-frequency kernel)") {
    import org.apache.spark.sql.functions._
    val terms = TextOps.Bm25Terms
    val w = split(col("text"), " ")
    val refCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(w, x => x === lit(t))).as(s"ref$i") }
    val df = graft.core.Tables.documents(spark, dir)
      .select((graft.functions.VectorFunctions.termCountBank(w, terms)
        .as("got") +: refCols): _*)
    val bad = terms.indices.map(i =>
      element_at(col("got"), i + 1) =!= col(s"ref$i")).reduce(_ || _)
    assert(df.filter(bad).count() == 0)
    // the corpus must actually exercise nonzero counts
    assert(df.filter(element_at(col("got"), 1) > 0).count() > 0)
  }
}
