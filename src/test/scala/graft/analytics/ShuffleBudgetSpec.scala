package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSuite

/** Shuffle BUDGETS: the number of shuffle exchanges each flagship plan
  * is allowed — the wire cost that decides 100 TB behavior. A
  * regression that introduces an extra exchange (a lost partitioning
  * reuse, an accidental repartition, a join that stopped broadcasting)
  * fails here by name instead of surfacing as a slow bench. Broadcast
  * exchanges are deliberately NOT counted — they are the cheap
  * alternative the budget encourages. */
class ShuffleBudgetSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame) = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
  }

  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range|SinglePartition)".r
      .findAllIn(finalPlan(df).toString).length

  private def assertBudget(name: String, df: DataFrame, budget: Int): Unit = {
    val n = shuffles(df)
    assert(n <= budget, s"$name: $n shuffles > budget $budget")
  }

  test("scan/map-only queries: one shuffle (the harness sort) at most") {
    assertBudget("s1_scan_project", RelationalQueries.s1ScanProject(spark, dir), 1)
    assertBudget("t1_lang_id", TextOps.t1LangId(spark, dir), 1)
    assertBudget("sp1_hash_split", TextOps.sp1HashSplit(spark, dir), 1)
  }

  test("q6 pure aggregate: single-partition gather only") {
    assertBudget("q6_filter_sum", AdvancedQueries.q6FilterSum(spark, dir), 1)
  }

  test("group aggregates: one agg shuffle + the harness sort") {
    assertBudget("q1_agg", RelationalQueries.q1Agg(spark, dir), 2)
    assertBudget("n1_dedup_exact", DedupOps.n1DedupExact(spark, dir), 2)
  }

  test("broadcast dimension join: no join shuffle — agg + sort only") {
    assertBudget("j2_broadcast_join", RelationalQueries.j2BroadcastJoin(spark, dir), 2)
  }

  test("salted aggregation: two agg phases + sort, hot key never on one reducer") {
    assertBudget("e4_salted_agg", EventQueries.e4SaltedAgg(spark, dir), 3)
  }

  test("quarantine split: map-only annotate + the harness sort") {
    assertBudget("e5b_json_quarantine",
      EventQueries.e5bJsonQuarantine(spark, dir), 1)
  }

  test("evolved-lineage scan: merged read is map-only + sort") {
    assertBudget("set3_evolved_scan",
      AdvancedQueries.set3EvolvedScan(spark, dir), 1)
  }

  test("EXISTS decorrelation: semi/anti joins never add per-row subquery work") {
    assertBudget("q4_exists", AdvancedQueries.q4Exists(spark, dir), 3)
    assertBudget("q21_not_exists", AdvancedQueries.q21NotExists(spark, dir), 4)
  }

  test("repetition signals: bigram agg + per-doc rollup + sort") {
    assertBudget("t6_repetition", TextOps.t6Repetition(spark, dir), 3)
  }

  test("decontamination: broadcast eval set — corpus side shuffles hashes once + agg + sort") {
    // 5 = train ngram window + eval ngram window (separate lineages —
    // Spark has no cross-branch subplan reuse without materialization)
    // + eval distinct + distinct-count agg + harness sort. The join
    // itself is broadcast: ZERO corpus-side join exchange, which is the
    // property that matters at 100 TB (the eval set is benchmark-sized).
    assertBudget("n6_decontaminate", DedupOps.n6Decontaminate(spark, dir), 5)
  }

  test("native session windows: one session-merge agg + sort") {
    assertBudget("e9_session_window", EventQueries.e9SessionWindow(spark, dir), 2)
  }

  test("incremental dedup: fingerprint agg + existing-set anti join + sort") {
    assertBudget("n1b_dedup_incremental",
      DedupOps.n1bDedupIncremental(spark, dir), 4)
  }

  test("approx profiler: one gather, no Expand-driven row multiplication") {
    assertBudget("p1b_profile_approx",
      InsightQueries.p1bProfileApprox(spark, dir), 2)
  }

  test("sp5 mixture: two corpus shuffles + two #domains-row quota exchanges") {
    // corpus-scale wire cost is 2 (domain-count agg + rank window); the
    // other two exchanges move ≤ #domains rows (the quota aggregate's
    // gather) and the final k-row sort — quota application itself rides
    // a broadcast, never an exchange
    assertBudget("sp5_mixture_sample", TextOps.sp5MixtureSample(spark, dir), 4)
  }

  test("sp9 DSIR: single tokenize pass — the measured plan reads the " +
      "materialized compact frame (r12 paid the explode twice)") {
    // the corpus pass (explode + compact (doc_id,lang,bucket) agg, one
    // exchange bounded by docs·min(words,256) rows) runs ONCE in the
    // checkpoint job; the measured plan's 4 exchanges all move
    // compact-or-smaller data: score's 256-row bucket aggregate, the
    // per-doc weight aggregate, the bar's 1-row gather over the 256-row
    // score table (the Σ raw_c·s identity — NO weight-lineage
    // re-execution), and the harness sort. A 5th exchange here would
    // mean a corpus pass snuck back into the measured plan
    val df = TextOps.sp9DsirSelect(spark, dir)
    assertBudget("sp9_dsir_select", df, 4)
    // and the measured plan must not re-scan the corpus at all: the
    // tokenize pass lives in the materialization, not here
    assert(!finalPlan(df).toString.contains("FileScan"),
      "sp9 measured plan re-scans the corpus — single-pass regressed")
  }

  test("n2c incremental near-dup: bounded exchanges, and the published " +
      "side's postings reduce under a broadcast semi join (no full " +
      "pub-side prefix shuffle)") {
    // 9 = the two shingle-set aggregates (new + pub lineages, each one
    // doc_id exchange), the candidate ph-join's two sides, the
    // candidate-pair distinct, the two verification joins back to the
    // signature frames (da- and db-keyed), the pair aggregate, and the
    // harness sort. What the budget EXCLUDES is the property that
    // matters: the published prefix stream's semi-join reduction rides
    // a BroadcastExchange (asserted below), so the pub side never pays
    // a full prefix-stream shuffle — candidate state is O(new batch)
    // at any published-table size.
    val df = DedupOps.n2cNeardupIncremental(spark, dir)
    assertBudget("n2c_neardup_incremental", df, 9)
    val p = finalPlan(df).toString
    assert(p.contains("LeftSemi") && p.contains("BroadcastExchange"), p)
  }

  test("n11 dup spans: fully linear — posting shuffle on h, anchors " +
      "re-shuffle on doc_id, harness sort; nothing consumed twice") {
    // duplicated-anchor detection is a min≠max window over the
    // h-partitioning (one posting-stream exchange), replacing r12's
    // doc-frequency aggregate + self-join that tokenized twice; the
    // gaps-and-islands stack (lag, island running sum, span groupBy)
    // all runs on the single doc_id partitioning of the surviving
    // anchors — HashPartitioning(doc_id) satisfies the (doc_id,
    // island) clustering, so none of the three adds wire cost
    val df = DedupOps.n11DupSpans(spark, dir)
    assertBudget("n11_dup_spans", df, 3)
    assert("Scan parquet".r.findAllIn(finalPlan(df).toString).length == 1,
      "n11 must scan the corpus exactly once")
  }

  test("t14c held-out BPE apply: training aside, the APPLY plan is one " +
      "distinct-word aggregate + a broadcast-joined billing aggregate") {
    // 6 = training init's two aggregates (word freq + initial pair
    // count, each one exchange) + the held-out distinct (1) + the
    // billing aggregate (1) + the harness sort (1) + one AQE coalesce
    // margin. Per-ROUND work never appears here: elections are
    // per-partition top-1 collects and fusions are map-only over the
    // checkpointed stream (the r15 incremental-trainer property), so
    // a budget blowout means a stream-sized shuffle crept back in.
    val df = TokenOps.t14cBpeApplyOn(spark,
      graft.core.Tables.documents(spark, dir), TokenOps.BpeRounds)
    assertBudget("t14c_bpe_apply", df, 6)
  }

  test("t15 tokenizer compare: the cross-family join adds one " +
      "distinct-word join and a #languages-row aggregate, nothing " +
      "corpus-shaped") {
    val df = TokenOps.t15TokenizerCompare(spark, dir)
    assertBudget("t15_tokenizer_compare", df, 7)
  }

  test("t7 BM25: corpus stats gather + top-k heap — never a global sort") {
    val df = TextOps.t7Bm25(spark, dir)
    assertBudget("t7_bm25", df, 3)
    df.collect()
    val p = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }).toString
    // the corpus-wide top-k is a TakeOrderedAndProject (per-partition
    // heaps + one k-row gather); a Sort over the full corpus would be
    // the 100 TB antipattern
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
