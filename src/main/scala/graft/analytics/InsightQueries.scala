package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Dataset-insight operators — the profiling / funnel / cohort layer an
  * analyst or data-quality system runs over any table before and after
  * a pipeline. All single-digit-shuffle formulations; no reference
  * analog (the reference has no analytics surface — SURVEY.md §2.11),
  * engine-surface additions like §2.6.
  */
object InsightQueries {

  /** Generic one-pass column profiler: for each requested column, null
    * count, distinct count, min/max (string-rendered so one result
    * schema fits every column type). ONE aggregate pass computes all
    * columns' stats; the wide row then unpivots to long form —
    * profiling never rescans per column.
    *
    * Distinct counts default to `approx_count_distinct` (HLL++): at
    * 100 TB that is the only sane profiler default, because N exact
    * distinct aggregates in one pass force an Expand — every input row
    * is replicated N+1 times and every distinct value of every profiled
    * column rides the shuffle — whereas N HLL sketches fold map-side
    * into constant-size state (one ordinary partial-agg shuffle, no
    * Expand; PlanAuditSpec pins both plan shapes). `exactDistinct=true`
    * keeps the exact semantics for small/oracle-checked profiles. */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg.as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    wide.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
      .orderBy(col("col_name"))
  }

  /** P1: profile the customer table (null/distinct/min/max per column).
    * Exact distinct counts — this is the oracle-checked variant on a
    * bounded column set, the one place exactness is worth the Expand. */
  def p1Profile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.customer(spark, dir),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      exactDistinct = true)

  /** P1b: the scale-default profiler — same stats with HLL++ distinct
    * counts (no Expand, constant-size agg state). Sketch estimates are
    * implementation-specific, so since r11 the QUERY rides the hash
    * gate as a BRACKET (the a13/a5 pattern): the emitted rows are p1's
    * exact profile (DuckDB-recomputable), and `approx_in_tol` asserts
    * per column that the HLL++ estimate lands within ±15% of the exact
    * distinct count (3× the default 5% rsd) — a sketch regression
    * flips a hashed boolean. The production artifact is the approx
    * plan (no Expand — PlanAuditSpec pins both shapes); the exact side
    * is gate scaffolding. */
  def p1bProfileApprox(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.customer(spark, dir),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))

  def p1bProfileApproxBracket(spark: SparkSession, dir: String): DataFrame = {
    val exact = p1Profile(spark, dir)
    val approx = p1bProfileApprox(spark, dir)
      .select(col("col_name"), col("n_distinct").as("approx_distinct"))
    exact.join(approx, Seq("col_name"))
      .withColumn("approx_in_tol",
        abs(col("approx_distinct") - col("n_distinct")) <=
          col("n_distinct") * 0.15)
      .select(col("col_name"), col("n_nulls"), col("n_distinct"),
        col("min_val"), col("max_val"), col("approx_in_tol"))
      .orderBy(col("col_name"))
  }

  val p1ProfileSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM customer""".stripMargin
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val p1bProfileApproxSql: String =
    p1ProfileSql
      .replace("AS max_val", "AS max_val,\n  true AS approx_in_tol")

  /** F3: ordered FUNNEL — how many users did view → click → purchase in
    * event-time order. Each step's earliest qualifying timestamp is an
    * aggregate over the previous step's result: three groupBys on
    * user_id, but every one reuses the same hash partitioning, so the
    * wire cost is one shuffle of the event slice. */
  def f3Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    // three 1-row aggregates cross-joined — one plan, no driver actions
    s1.agg(count(lit(1)).as("n_view"))
      .crossJoin(s2.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(s3.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  val f3FunnelSql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM s1) AS n_view,
      |       (SELECT count(*) FROM s2) AS n_view_click,
      |       (SELECT count(*) FROM s3) AS n_view_click_purchase""".stripMargin

  /** C2: weekly COHORT retention — users bucketed by first-seen week;
    * per (cohort week, weeks-since) the distinct users still active.
    * Two aggregates + one join on user_id: the cohort assignment is
    * itself an aggregate, never a correlated lookup. */
  def c2CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val week = (c: Column) => date_trunc("week", c)
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val firstWeek = ev.groupBy(col("user_id"))
      .agg(week(min(col("ts"))).as("cohort_week"))
    ev.join(firstWeek, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        floor(datediff(col("ts").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("long").as("weeks_since"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  val c2CohortRetentionSql: String =
    """WITH fw AS (SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP
      |              AS cohort_week
      |            FROM events GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(floor(date_diff('day', cohort_week::DATE, ts::DATE) / 7.0) AS BIGINT)
      |    AS weeks_since,
      |  count(DISTINCT e.user_id) AS n_active
      |FROM events e JOIN fw ON e.user_id = fw.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_profile" -> (p1Profile _),
    "p1b_profile_approx" -> (p1bProfileApproxBracket _),
    "f3_funnel" -> (f3Funnel _),
    "c2_cohort_retention" -> (c2CohortRetention _),
  )

  def oracleSql: Map[String, String] = Map(
    "p1_profile" -> p1ProfileSql,
    "p1b_profile_approx" -> p1bProfileApproxSql,
    "f3_funnel" -> f3FunnelSql,
    "c2_cohort_retention" -> c2CohortRetentionSql,
  )
}
