package graft.analytics

import graft.SparkSuite
import graft.core.Tables

/** Smoke-reads every testdata table at sf0.001 — catches schema surprises
  * (e.g. parquet TIMESTAMP(NANOS) support) before queries build on them. */
class TestdataReadSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")) {
    test(s"$t reads and counts") {
      val df = if (t == "events") Tables.events(spark, dir) else Tables(spark, dir, t)
      assert(df.count() > 0)
    }
  }

  test("events ts column is a usable timestamp") {
    val df = Tables.events(spark, dir)
    df.printSchema()
    val r = df.selectExpr("min(ts)", "max(ts)").head()
    println(s"events ts range: $r")
    assert(r.get(0) != null)
  }
}
