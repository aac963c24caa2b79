package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** The composed LLM-prep journey (quarantine → dedup → near-dup →
  * decontaminate → quality → chunk): every stage exercised on a literal
  * corpus with hand-computed counts, composed ≡ individually-run on real
  * testdata, production observe-based counts ≡ both, and the whole
  * journey's scan/shuffle budget pinned. */
class LlmPrepJourneySpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  /** Literal corpus hitting every drop reason exactly once (word counts
    * chosen so each gate's arithmetic is hand-checkable):
    *  1  null text            → quarantined
    *  2  two words            → quarantined (< MinWords)
    *  3  textA (30 words)     → KEPT, 1 chunk
    *  4  textA again          → exact dup of 3
    *  5  textA ± one word     → near-dup of 3 (J = 25/31 ≈ 0.8065 ≥ 0.8)
    *  10 textE (20 words)     → eval slice (id % 10 = 0)
    *  11 8-word verbatim run from textE → contaminated
    *  12 twenty "!!!" tokens  → low quality (q ≈ 0.045 < 0.5)
    *  13 textD (45 words)     → KEPT, 2 chunks ((45-1) DIV 40 + 1)
    */
  private lazy val literal: DataFrame = {
    import spark.implicits._
    val stop = "the a and of to in is" // 7 stopwords → 4.7·(7/n) caps the
                                       // stop factor at 1.0 for n ≤ 32
    def mk(n: Int, tag: String): String =
      stop + " " + (1 to (n - 7)).map(i => s"$tag$i").mkString(" ")
    val textA = mk(30, "a")
    val textB = textA.replace(" a10 ", " zz ")
    val textE = mk(20, "e")
    val run8 = (3 to 10).map(i => s"e$i").mkString(" ")
    val textC = (1 to 10).map(i => s"c$i").mkString(" ") + " " + run8
    val textF = Seq.fill(20)("!!!").mkString(" ")
    val textD = mk(45, "d")
    Seq(
      1L -> null.asInstanceOf[String], 2L -> "tiny doc",
      3L -> textA, 4L -> textA, 5L -> textB,
      10L -> textE, 11L -> textC, 12L -> textF, 13L -> textD,
    ).toDF("doc_id", "text")
  }

  private val expected = Seq(
    "0_input" -> 9L, "1_clean" -> 7L, "2_unique" -> 6L,
    "3_neardup_kept" -> 5L, "4_decontaminated" -> 3L,
    "5_quality_kept" -> 2L, "6_chunks" -> 3L)

  test("literal corpus: every stage drops exactly its targets") {
    val got = LlmPrep.journeyCountsOn(literal).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
  }

  test("instrumented production run: observed counts from ONE action") {
    val jr = LlmPrep.instrumented(literal)
    assert(jr.chunks.count() == 3L) // the single materializing action
    assert(jr.counts() == Map(
      "n_input" -> 9L, "n_clean" -> 7L, "n_unique" -> 6L,
      "n_neardup_kept" -> 5L, "n_decontaminated" -> 3L,
      "n_quality_kept" -> 2L,
      // the near-dup cap counter rides the SAME report (r11 #4):
      // zero here - nothing was traded
      "n2_posting_drops" -> 0L))
    // and the chunks are the right ones: doc 3 (1 chunk) + doc 13 (2)
    assert(jr.chunks.select("doc_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L, 13L))
  }

  test("observed counts survive a WRITE action (no sort-sampling double-fire)") {
    // regression: when chunks ended in orderBy, the write's range-bounds
    // sampling job executed the observed lineage a second time and every
    // count doubled (count() actions hid it — the optimizer eliminates
    // the sort under aggregation). The journey chunks are unordered.
    val jr = LlmPrep.instrumented(literal)
    val out = java.nio.file.Files.createTempDirectory("llm-chunks")
      .resolve("t").toString
    jr.chunks.write.parquet(out)
    assert(jr.counts() == Map(
      "n_input" -> 9L, "n_clean" -> 7L, "n_unique" -> 6L,
      "n_neardup_kept" -> 5L, "n_decontaminated" -> 3L,
      "n_quality_kept" -> 2L, "n2_posting_drops" -> 0L))
    assert(spark.read.parquet(out).count() == 3L)
  }

  test("EMPTY drop list (AQE erases the cap nodes): counts() returns " +
      "without the listener timeout — VERDICT r12 nit #3") {
    import spark.implicits._
    // two clean distinct docs: no dups, no contamination — the near-dup
    // drop list is EMPTY, so AQE's empty-relation propagation erases
    // the cap metric nodes and r12's watcher slept its full 8 s waiting
    // for a metric that could never arrive
    val stop = "the a and of to in is"
    def mk(n: Int, tag: String): String =
      stop + " " + (1 to (n - 7)).map(i => s"$tag$i").mkString(" ")
    val organic = Seq(3L -> mk(30, "a"), 13L -> mk(45, "d"))
      .toDF("doc_id", "text")
    val jr = LlmPrep.instrumented(organic)
    assert(jr.chunks.count() == 3L)
    val t0 = System.nanoTime()
    val obs = jr.counts()
    val ms = (System.nanoTime() - t0) / 1000000L
    assert(!obs.contains("n2_posting_drops"),
      s"an erased counter reappeared (never wrongly zero, absent): $obs")
    assert(obs("n_quality_kept") == 2L)
    assert(ms < 4000,
      s"counts() stalled ${ms}ms — the organic-corpus listener timeout " +
        "is back")
  }

  test("composed counts equal the individually-run cascade (testdata)") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val d1 = LlmPrep.cleanStage(docs)
    val d2 = LlmPrep.dedupStage(d1)
    val d3 = LlmPrep.nearDupStage(d2)
    val d4 = LlmPrep.decontamStage(d3, docs)
    val d5 = LlmPrep.qualityStage(d4)
    val ch = LlmPrep.chunkStage(d5)
    val individual = Seq(
      "0_input" -> docs.count(), "1_clean" -> d1.count(),
      "2_unique" -> d2.count(), "3_neardup_kept" -> d3.count(),
      "4_decontaminated" -> d4.count(), "5_quality_kept" -> d5.count(),
      "6_chunks" -> ch.count())
    // the one-pass flag formulation (the harness query)…
    val composed = LlmPrep.journeyCountsOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(composed == individual)
    // …and the production observe-instrumented run agree
    val jr = LlmPrep.instrumented(docs)
    val nChunks = jr.chunks.count()
    val obs = jr.counts()
    assert(nChunks == individual.toMap.apply("6_chunks"))
    assert(obs == Map(
      "n_input" -> individual.toMap.apply("0_input"),
      "n_clean" -> individual.toMap.apply("1_clean"),
      "n_unique" -> individual.toMap.apply("2_unique"),
      "n_neardup_kept" -> individual.toMap.apply("3_neardup_kept"),
      "n_decontaminated" -> individual.toMap.apply("4_decontaminated"),
      "n_quality_kept" -> individual.toMap.apply("5_quality_kept"),
      "n2_posting_drops" -> 0L)) // organic corpus: the cap never fires
    // every stage actually removes something at this sf — the cascade
    // is exercised end-to-end, not vacuously
    val m = individual.toMap
    assert(m("1_clean") < m("0_input") && m("2_unique") <= m("1_clean") &&
      m("4_decontaminated") < m("3_neardup_kept") &&
      m("5_quality_kept") < m("4_decontaminated"))
  }

  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case o => o.children.flatMap(scans) ++ o.subqueries.flatMap(scans)
  }

  test("a cap-firing corpus surfaces NONZERO drop counters in the " +
      "journey report (the recall trade is visible, not silent)") {
    import spark.implicits._
    // a journey-sized posting crowd: 400 DISTINCT 15-word docs (past
    // the MinWords quarantine) sharing a 13-word lead — 11 shared
    // shingles whose smallest fixed hash sits in almost every doc's
    // PPJoin prefix, so its posting group blows far past the 64-doc
    // occupancy cap inside nearDupStage, while pairwise Jaccard stays
    // 11/15 ≈ 0.73 < θ (the crowd itself is NOT near-dup). Docs 500/
    // 501 are a genuine near-dup pair (one word differs, J ≈ 0.87):
    // the drop list stays nonempty, so AQE's empty-relation rewrite
    // cannot erase the branch (the JourneyRun scaladoc corner).
    val lead = (1 to 13).map(i => s"zz$i").mkString(" ")
    val base = (1 to 45).map(i => s"c$i").mkString(" ")
    val crowd = ((1L to 400L).map(i => (i, s"$lead x$i y$i")) ++
      Seq(500L -> base, 501L -> base.replace(" c10 ", " zq ")))
      .toDF("doc_id", "text")
    val jr = LlmPrep.instrumented(crowd)
    jr.chunks.count() // the single materializing action
    val obs = jr.counts()
    assert(obs("n_input") == 402L)
    assert(obs("n_neardup_kept") == 401L, // only 501 is really near-dup
      s"staging bug: unexpected near-dup drops: $obs")
    assert(obs.contains("n2_posting_drops") && obs("n2_posting_drops") > 0L,
      s"expected a nonzero cap-drop counter in the report, got $obs")
  }

  test("journey budget: corpus scans and shuffles bounded, counting is free") {
    // the counts query: one labeling pass + two id-only drop-list
    // branches. The near-dup branch re-reads the corpus for its shingle
    // stream and verification sets (the n2 structure), the decontam
    // branch for train + eval n-grams — every scan prunes to
    // (doc_id, text), and composing adds NO scan beyond those branches.
    val q = LlmPrep.llm1PrepCounts(spark, dir)
    q.collect()
    val qScans = scans(finalPlan(q)).filter(_.relation.location.rootPaths
      .exists(_.toString.contains("documents.parquet")))
    assert(qScans.nonEmpty && qScans.size <= 7,
      s"corpus scanned ${qScans.size} times")
    qScans.foreach { s =>
      val read = s.metadata.getOrElse("ReadSchema", "")
      assert(!read.contains("lang") && !read.contains("source"),
        s"journey scan reads unused columns: $read")
    }
    // inherent budget 17 (verified in-plan: window partitionings are
    // ReusedExchange'd and both drop lists broadcast): fp-rank window 1
    // + final single-row gather 1 + near-dup branch 9 (shingle window,
    // doc_id set-agg, prefix postings, pair distinct, verify join —
    // plus the r11 skew armor's 4: exact-dup class window, intra-class
    // expansion self-join, and the two cross-class membership joins
    // that re-expand representative pairs) + decontam branch 6
    // (train/eval n-gram windows 2, per-side distincts 2,
    // join + ct distinct 2)
    val exchanges = "Exchange (hash|range|SinglePartition)".r
      .findAllIn(finalPlan(q).toString).length
    assert(exchanges <= 17, s"journey: $exchanges shuffles > budget 17")

    // instrumentation adds zero scans: the observed production plan
    // reads the corpus exactly as often as the bare cascade
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val bare = LlmPrep.chunkStage(LlmPrep.qualityStage(LlmPrep.decontamStage(
      LlmPrep.nearDupStage(LlmPrep.dedupStage(LlmPrep.cleanStage(docs))), docs)))
    bare.collect()
    val jr = LlmPrep.instrumented(docs)
    jr.chunks.collect()
    assert(scans(finalPlan(jr.chunks)).size == scans(finalPlan(bare)).size,
      "observe instrumentation changed the scan count")
  }
}
