package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, InSet}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Runtime row-level join filtering ([[RuntimeJoinFilter]], VERDICT r10
  * missing #1): build-side join keys become a static IN pushed into the
  * probe-side store scan, where bloom sidecars and zone maps drop files
  * — plan-pinned here, result-invisibility pinned by the store21
  * oracle. */
class StoreRuntimeFilterSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private lazy val root: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rjf")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
    val r = tmp.resolve("store").toString
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents_v"))
      .repartitionByRange(8, col("o_custkey"))
    AtomicPublish.publish(spark, r, Map("orders" -> ord),
      statsBy = Map("orders" -> Seq("o_orderkey", "o_custkey")),
      bloomBy = Map("orders" -> Seq("o_custkey")))
    r
  }

  private def dimKeys(lo: Int, hi: Int): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("c_custkey").between(lo, hi))
      .select(col("c_custkey"))

  private def joined(): DataFrame =
    AtomicPublish.readTable(spark, root, "orders")
      .join(dimKeys(10, 40), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("cents_v"))

  private def insetFilters(plan: LogicalPlan): Seq[Filter] =
    plan.collect {
      case f @ Filter(InSet(a: AttributeReference, _), _)
          if a.name == "o_custkey" => f
    }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case o => o.children.flatMap(scans) ++ o.subqueries.flatMap(scans)
  }

  test("the rule plants the build keys as an InSet directly above the store scan") {
    val q = joined()
    val filters = insetFilters(q.queryExecution.optimizedPlan)
    assert(filters.nonEmpty, s"no InSet:\n${q.queryExecution.optimizedPlan}")
    val keys = filters.head.condition.asInstanceOf[InSet].hset
    val expected = dimKeys(10, 40).collect().map(_.getLong(0)).toSet
    assert(keys == expected.asInstanceOf[Set[Any]])
  }

  test("file-subset reduction: the planted keys skip fact files via blooms/zone maps") {
    val q = joined()
    q.collect()
    val factScans = scans(q.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[GraftFileIndex])
    assert(factScans.nonEmpty)
    val read = factScans.map(s =>
      s.metrics("numFiles").value).sum
    val total = factScans.map(
      _.relation.location.inputFiles.length.toLong).sum
    assert(total >= 8, s"staging should have produced >=8 files, got $total")
    assert(read < total,
      s"no file skipping: read $read of $total")
    assert(read <= total / 2,
      s"weak skipping: read $read of $total (keys span ~1/8 of the range)")
  }

  test("the rewrite is result-invisible (same rows with the rule disabled)") {
    val expected = {
      spark.conf.set(RuntimeJoinFilter.EnabledKey, "false")
      try joined().collect().toSet
      finally spark.conf.unset(RuntimeJoinFilter.EnabledKey)
    }
    val got = joined().collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("gates hold: non-covered key column and unselective build stay untouched") {
    // probe key NOT among bloom/stat columns: cents_v
    val byValue = AtomicPublish.readTable(spark, root, "orders")
      .join(dimKeys(10, 40).select((col("c_custkey") * 100).as("v")),
        col("cents_v") === col("v"))
    assert(byValue.queryExecution.optimizedPlan.collect {
      case f @ Filter(InSet(a: AttributeReference, _), _)
          if a.name == "cents_v" => f
    }.isEmpty)
    // build side with no selective filter: full customer table
    val unfiltered = AtomicPublish.readTable(spark, root, "orders")
      .join(Tables.customer(spark, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
    assert(insetFilters(unfiltered.queryExecution.optimizedPlan).isEmpty)
  }
}
