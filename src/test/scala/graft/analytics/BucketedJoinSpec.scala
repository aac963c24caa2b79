package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Bucketing = the 100 TB co-location strategy (SURVEY.md §2.3 /
  * Tables.scala scaladoc): tables bucketed on the join key join WITHOUT
  * any exchange — each task reads matching buckets from both sides. At
  * scale this turns every orders⋈lineitem from a 2-sided shuffle into a
  * local merge. This spec materializes bucketed copies of the testdata
  * and pins the exchange-free plan. */
class BucketedJoinSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ lineitem joins with ZERO exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val db = "graft_bucket_test" // LOCATION pins all tables under the temp dir
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
    try {
      Tables.orders(spark, dir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      Tables.lineitem(spark, dir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem_b")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(s"$db.orders_b")
          .join(spark.table(s"$db.lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        // the join itself must be exchange-free; only the final
        // aggregation may shuffle (one row per status)
        val joinPart = plan.split("HashAggregate").last
        assert(!joinPart.contains("Exchange hashpartitioning"), joinPart)

        // same result as the plain (shuffling) join
        val plain = Tables.orders(spark, dir)
          .join(Tables.lineitem(spark, dir),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        assert(joined.orderBy("o_orderstatus").collect().toSeq ==
          plain.orderBy("o_orderstatus").collect().toSeq)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
