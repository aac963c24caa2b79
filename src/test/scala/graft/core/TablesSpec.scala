package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TablesSpec extends SparkSuite {
  import spark.implicits._

  test("fingerprint walks partition subdirectories and moves on rewrite") {
    // regression: a top-level-only listing sees zero FILES under a
    // partitioned layout (data lives only below partition dirs) and
    // returns a constant — every fingerprint-keyed cache would then
    // serve stale models across in-place rewrites forever
    val base = java.nio.file.Files.createTempDirectory("graft-fp").toString
    Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "p")
      .write.partitionBy("p").parquet(s"$base/t.parquet")
    val fp1 = Tables.fingerprint(spark, base, "t")
    assert(!fp1.startsWith("0:"), s"partitioned table fingerprinted empty: $fp1")
    Thread.sleep(5) // distinct mtime tick on the local fs
    Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)).toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$base/t.parquet")
    val fp2 = Tables.fingerprint(spark, base, "t")
    assert(fp2 != fp1, "rewrite under partition dirs did not change the fingerprint")
  }

  test("memoFresh recomputes exactly when the fingerprint moves") {
    val base = java.nio.file.Files.createTempDirectory("graft-memo").toString
    Seq(1L, 2L).toDF("id").write.parquet(s"$base/t.parquet")
    val cache = new scala.collection.concurrent.TrieMap[String, (String, Long)]
    var computes = 0
    def get(): Long = Tables.memoFresh(cache, spark, base, "t") {
      computes += 1
      spark.read.parquet(s"$base/t.parquet").count()
    }
    assert(get() == 2L && get() == 2L && computes == 1, "memo must hit")
    Thread.sleep(5)
    Seq(1L, 2L, 3L).toDF("id").write.mode("overwrite")
      .parquet(s"$base/t.parquet")
    assert(get() == 3L && computes == 2, "rewrite must invalidate")
  }
}
