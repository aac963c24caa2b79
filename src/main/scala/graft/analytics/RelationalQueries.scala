package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational operator coverage over the harness testdata (SURVEY.md §2/§7.2 M0+M2).
  *
  * Conventions that keep every query DuckDB-oracle hash-comparable
  * (SURVEY.md §7.4):
  *   - explicit ORDER BY on a unique (or group-key) prefix — never rely on
  *     implicit order (the reference relies on DB insertion order at
  *     /root/reference/app/api/routes.py:216-226, a bug we fix);
  *   - every computed column aliased identically in Spark and SQL;
  *   - aggregated doubles `round(_, 2)` so summation-order float noise
  *     cannot flip the hash;
  *   - no nondeterministic functions (uuid / encrypt / current_timestamp)
  *     in oracle-declared queries.
  *
  * Scale notes are inline per query: each is a single Catalyst plan with
  * filters/pruning pushed to the parquet scan, map-side partial aggregation,
  * and broadcast joins for bounded dims — the same plan shape survives a
  * 1000-executor cluster because nothing ever collects to the driver.
  */
object RelationalQueries {

  /** Round all double columns of an aggregate output for cross-engine hash
    * stability. */
  private def r2(c: Column): Column = round(c, 2)

  // ===========================================================================
  // Scans / filters / projections (S1, F1/F2, P1/P2)
  // ===========================================================================

  /** S1+P2: pruned scan — projection + predicate both reach the parquet
    * reader (PushedFilters / ReadSchema); at 100 TB this is the difference
    * between reading 2 columns and reading 11. */
  def s1ScanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val s1ScanProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem WHERE l_quantity > 45.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** F1 consent-gate analog: null-safe boolean predicate + complement split.
    * Returns the "blocked" side with a reason column, mirroring
    * /root/reference/app/etl/pipeline.py:64-84 (strict `is True` gate). */
  def f1FilterSplit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val gate = col("o_orderstatus") <=> lit("O") // null-safe, like `is True`
    o.filter(!gate)
      .select(col("o_orderkey"), lit("not an open order").as("reason"))
      .orderBy(col("o_orderkey"))
  }

  val f1FilterSplitSql: String =
    """SELECT o_orderkey, 'not an open order' AS reason
      |FROM orders WHERE NOT (o_orderstatus IS NOT DISTINCT FROM 'O')
      |ORDER BY o_orderkey""".stripMargin

  /** F2: point lookup by key — partition-prunable at scale (the reference's
    * PK lookup, /root/reference/app/api/routes.py:171-179). */
  def f2PointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") === 42L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        r2(col("o_totalprice")).as("o_totalprice"))

  val f2PointLookupSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |round(o_totalprice, 2) AS o_totalprice
      |FROM orders WHERE o_orderkey = 42""".stripMargin

  // ===========================================================================
  // Aggregations (A1-A4 + engine-surface extensions)
  // ===========================================================================

  /** A1/A2 flagship: TPC-H-Q1-shaped multi-aggregate. Map-side partial
    * aggregation (HashAggregate → shuffle on 6-ish group keys →
    * HashAggregate) — the shuffle carries one row per group per partition,
    * not the 100 TB fact table. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("sum_disc_price"),
        r2(avg(col("l_quantity"))).as("avg_qty"),
        r2(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |round(sum(l_quantity), 2) AS sum_qty,
      |round(sum(l_extendedprice), 2) AS sum_base_price,
      |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |round(avg(l_quantity), 2) AS avg_qty,
      |round(avg(l_discount), 2) AS avg_disc,
      |count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A4: boolean any() aggregate per key (the reference's has-consent flag,
    * /root/reference/app/api/routes.py:181-183) — `bool_or` via max(when). */
  def a4BoolAny(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max(when(col("o_orderstatus") === "O", true).otherwise(false))
          .as("has_open_order"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))

  val a4BoolAnySql: String =
    """SELECT o_custkey,
      |bool_or(o_orderstatus = 'O') AS has_open_order,
      |count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ===========================================================================
  // Joins (J1-J3)
  // ===========================================================================

  /** J1: the consented-patient listing transposed — customers having a
    * granted "consent" (an open order), as a LEFT SEMI join (dedup-safe,
    * preferred over inner+distinct per SURVEY.md §2.3). The semi join's
    * build side is only (key) pairs; at scale AQE converts to broadcast
    * when the filtered right side is small. */
  def j1SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val j1SemiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** J1-inner + small-dim broadcast: customer ⋈ nation ⋈ region with a
    * region filter. nation (25 rows) and region (5 rows) are explicitly
    * `broadcast()` — zero shuffle of the big side; only the final agg
    * shuffles one row per nation. */
  def j2BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        r2(sum(col("c_acctbal"))).as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val j2BroadcastJoinSql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |round(sum(c_acctbal), 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** J3: referential-integrity orphan check as a LEFT ANTI join (the
    * reference's FK constraint, /root/reference/app/models/patient.py:62,86
    * — and its duplicate-mrn 409 path, routes.py:96-103, is the same
    * anti-join shape). */
  /** The orphan check runs against a DEGRADED parent set (orders with
    * `o_orderkey % 3 = 1` treated as absent): the pristine corpus has
    * 0 orphans at sf0.01, and a 0-row result hash-matches vacuously
    * (the q11 lesson, VERDICT-r7 nit #3) — the filtered parent yields
    * real anti-join survivors at every scale factor (3 at sf0.01,
    * 20 at sf0.1), so the gate exercises anti-join hash semantics on
    * non-empty output. */
  def j3AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(pmod(col("o_orderkey"), lit(3)) =!= 1)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val j3AntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderkey % 3 <> 1)
      |ORDER BY c_custkey""".stripMargin

  // ===========================================================================
  // Sorts / limits / pagination (L1, L2)
  // ===========================================================================

  /** L1: the reference's capped pagination
    * (/root/reference/app/api/routes.py:208-226: limit=min(limit,200),
    * offset/limit) with the determinism fix — explicit unique sort key. */
  def l1Pagination(spark: SparkSession, dir: String): DataFrame = {
    val (offset, limit) = (20, math.min(50, 200))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), r2(col("c_acctbal")).as("c_acctbal"))
      .orderBy(col("c_custkey"))
      .offset(offset).limit(limit)
  }

  val l1PaginationSql: String =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
      |FROM customer ORDER BY c_custkey LIMIT 50 OFFSET 20""".stripMargin

  /** All M0-wave queries, keyed per SURVEY.md §2 operator IDs. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_scan_project" -> (s1ScanProject _),
    "f1_filter_split" -> (f1FilterSplit _),
    "f2_point_lookup" -> (f2PointLookup _),
    "q1_agg" -> (q1Agg _),
    "a4_bool_any" -> (a4BoolAny _),
    "j1_semi_join" -> (j1SemiJoin _),
    "j2_broadcast_join" -> (j2BroadcastJoin _),
    "j3_anti_join" -> (j3AntiJoin _),
    "l1_pagination" -> (l1Pagination _),
  )

  def oracleSql: Map[String, String] = Map(
    "s1_scan_project" -> s1ScanProjectSql,
    "f1_filter_split" -> f1FilterSplitSql,
    "f2_point_lookup" -> f2PointLookupSql,
    "q1_agg" -> q1AggSql,
    "a4_bool_any" -> a4BoolAnySql,
    "j1_semi_join" -> j1SemiJoinSql,
    "j2_broadcast_join" -> j2BroadcastJoinSql,
    "j3_anti_join" -> j3AntiJoinSql,
    "l1_pagination" -> l1PaginationSql,
  )
}
