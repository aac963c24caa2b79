package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[MetadataAggregates]] — full-table count/min/max served from the
  * manifest's recorded segment stats with ZERO data files read, and
  * every gate that must fall back to a real scan still answering
  * exactly. */
class MetadataAggregatesSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("meta-agg").resolve("store").toString

  private def scanCount(df: DataFrame): Int = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: FileSourceScanExec => 1
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case p => scans(p)
    }
  }

  private def mk(ids: Range, lang: String): DataFrame =
    ids.map(i => (i.toLong, lang,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        i.toLong * 3600)),
      if (i % 7 == 0) null else s"t$i")).toDF("id", "lang", "ts", "tag")

  test("count(*) / count(col) / min / max over long, string and " +
      "timestamp answer from the manifest — zero file scans") {
    val root = freshRoot()
    val v1 = AtomicPublish.publish(spark, root,
      Map("d" -> mk(10 until 60, "en").repartition(2)),
      statsBy = Map("d" -> Seq("id", "lang", "ts", "tag")))
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mk(60 until 100, "de").repartition(2)),
      parent = Some(v1))
    val t = AtomicPublish.readTable(spark, root, "d")
    val agg = t.agg(
      count(lit(1)).as("n"), count(col("tag")).as("n_tag"),
      min(col("id")).as("min_id"), max(col("id")).as("max_id"),
      min(col("lang")).as("min_lang"), max(col("lang")).as("max_lang"),
      min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    assert(scanCount(agg) == 0, "metadata aggregate must not scan files")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 90 && r.getLong(1) == 90 - 13) // 13 ids %7==0 in 10..99
    assert(r.getLong(2) == 10 && r.getLong(3) == 99)
    assert(r.getString(4) == "de" && r.getString(5) == "en")
    assert(r.getTimestamp(6) == java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(10L * 3600)))
    assert(r.getTimestamp(7) == java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(99L * 3600)))
    // value parity with the scan the rewrite replaced (rule disabled)
    spark.conf.set("spark.graft.metadataAggregates", "false")
    try {
      val ctl = t.agg(count(lit(1)), count(col("tag")), min(col("id")),
        max(col("id")), min(col("lang")), max(col("lang")),
        min(col("ts")), max(col("ts")))
      assert(scanCount(ctl) > 0, "control must really scan")
      assert(ctl.collect()(0) == r)
    } finally spark.conf.set("spark.graft.metadataAggregates", "true")
  }

  test("gates: filters, deletes, non-stat columns, DISTINCT and sum " +
      "all fall back to a real scan — and stay exact") {
    val root = freshRoot()
    val v1 = AtomicPublish.publish(spark, root,
      Map("d" -> mk(0 until 50, "en").repartition(2)),
      statsBy = Map("d" -> Seq("id", "lang")))
    // a filter above the scan breaks the match
    val t0 = AtomicPublish.readTable(spark, root, "d")
    val filtered = t0.filter(col("id") >= 40).agg(count(lit(1)).as("n"))
    assert(scanCount(filtered) > 0)
    assert(filtered.collect()(0).getLong(0) == 10)
    // a non-stat column bails (ts has no recorded ColStat)
    val nonStat = t0.agg(min(col("ts")).as("m"))
    assert(scanCount(nonStat) > 0)
    // DISTINCT and sum bail
    assert(scanCount(t0.agg(countDistinct(col("lang")).as("n"))) > 0)
    assert(scanCount(t0.agg(sum(col("id")).as("s"))) > 0)
    // merge-on-read deletes: the tombstone anti-join breaks the match,
    // and the delete-aware count is the SURVIVOR count
    AtomicPublish.deleteRows(spark, root,
      Map("d" -> (0L until 10L).toDF("id")))
    val t1 = AtomicPublish.readTable(spark, root, "d")
    val afterDelete = t1.agg(count(lit(1)).as("n"))
    assert(scanCount(afterDelete) > 0,
      "a tombstoned table must never metadata-count")
    assert(afterDelete.collect()(0).getLong(0) == 40)
  }

  test("all-null owners: count(col)/min/max stay exact when an owner's " +
      "column is entirely null (the pre-backfill shape)") {
    val root = freshRoot()
    // owner A: score present but ALL NULL (ColStat(None, None, rows))
    val a = (0 until 30).map(i => (i.toLong, "en", None: Option[Double]))
      .toDF("id", "lang", "score")
    val v1 = AtomicPublish.publish(spark, root, Map("d" -> a),
      statsBy = Map("d" -> Seq("id", "lang", "score")))
    val b = (30 until 50).map(i => (i.toLong, "de", Some(i * 1.5)))
      .toDF("id", "lang", "score")
    AtomicPublish.publishDelta(spark, root, append = Map("d" -> b),
      parent = Some(v1))
    val t = AtomicPublish.readTable(spark, root, "d")
    val agg = t.agg(count(lit(1)).as("n"), count(col("score")).as("n_s"),
      min(col("score")).as("mn"), max(col("score")).as("mx"))
    assert(scanCount(agg) == 0, "all-null owner must still metadata-serve")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 50 && r.getLong(1) == 20)
    assert(r.getDouble(2) == 45.0 && r.getDouble(3) == 73.5)
    // an ALL-null column across every owner: min is NULL, exactly
    val root2 = freshRoot()
    AtomicPublish.publish(spark, root2, Map("d" -> a),
      statsBy = Map("d" -> Seq("score")))
    val nullAgg = AtomicPublish.readTable(spark, root2, "d")
      .agg(min(col("score")).as("mn"), count(col("score")).as("n"))
    assert(scanCount(nullAgg) == 0)
    val nr = nullAgg.collect()(0)
    assert(nr.isNullAt(0) && nr.getLong(1) == 0L)
  }

  test("identity-evolved chains fall back to the real scan (per-class " +
      "union above the relations) — totals still exact") {
    val root = freshRoot()
    val v1 = AtomicPublish.publish(spark, root,
      Map("d" -> mk(0 until 30, "en")),
      statsBy = Map("d" -> Seq("id")))
    val vE = AtomicPublish.setPartitionSpec(spark, root, "d",
      Seq("lang")).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mk(30 until 50, "de")), parent = Some(vE))
    val agg = AtomicPublish.readTable(spark, root, "d")
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
    // the aggregate sits above a UNION of class relations — the
    // metadata rewrite must not fire (each class covers only part of
    // the table), and the union answer is exact
    assert(scanCount(agg) > 0,
      "identity-evolved chain must not metadata-serve")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 50 && r.getLong(1) == 0 && r.getLong(2) == 49)
  }

  test("time travel: each pinned version serves ITS totals from ITS " +
      "manifest") {
    val root = freshRoot()
    val v1 = AtomicPublish.publish(spark, root,
      Map("d" -> mk(0 until 20, "en")),
      statsBy = Map("d" -> Seq("id")))
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mk(20 until 50, "en")), parent = Some(v1))
    val old = AtomicPublish.readTableAt(spark, root, "d", v1)
      .agg(count(lit(1)).as("n"), max(col("id")).as("mx"))
    assert(scanCount(old) == 0)
    val r = old.collect()(0)
    assert(r.getLong(0) == 20 && r.getLong(1) == 19)
  }
}
