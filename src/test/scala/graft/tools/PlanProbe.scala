package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scratch plan probe (test scope, not shipped): prints exchange /
  * reuse / scan counts for the plans under restructuring study. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val dir = "/root/testdata/sf0.001"
    for ((name, df) <- Seq(
        "sp9" -> graft.analytics.TextOps.sp9DsirSelect(spark, dir),
        "n11" -> graft.analytics.DedupOps.n11DupSpans(spark, dir))) {
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }
      val s = p.toString
      println(s"=== $name ===")
      println("exchanges: " +
        "Exchange (hash|range|SinglePartition)".r.findAllIn(s).length)
      println("reused:    " + "ReusedExchange".r.findAllIn(s).length)
      println("scans:     " + "Scan parquet".r.findAllIn(s).length)
      println("generates: " + "Generate ".r.findAllIn(s).length)
      println(s)
    }
    spark.stop()
  }
}
