package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** IDENTITY partition-spec evolution (r10 — the Iceberg capability the
  * r9 freeze deferred): `setPartitionSpec` may now add or remove
  * IDENTITY entries on unbucketed tables. The column then lives in the
  * DIRECTORY layout of owners written under a spec including it and in
  * the DATA FILES otherwise, so the read mount groups owners into
  * identity-homogeneous classes and unions one native relation per
  * class ([[GraftFileIndex.relationFor]]) — each class serves the
  * column from where ITS files put it, values exact everywhere, and a
  * predicate on the column is a PARTITION filter for the dir-laid
  * class and a pushed DATA filter for the file-laid one. */
class IdentityEvolutionSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("ident-evolve").resolve("store").toString

  private def mk(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "en" else "de", s"p$i"))
      .toDF("id", "lang", "payload")

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    def go(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        go(q.plan)
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
    }.flatten
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case p => go(p)
    }
  }

  test("identity IN: unpartitioned birth, evolve to (lang), append — " +
      "values exact across both classes, dir layout on disk, the lang " +
      "predicate partition-prunes the new class") {
    val root = freshRoot()
    val v1 = AtomicPublish.publish(spark, root,
      Map("d" -> mk(0 until 40).repartition(1)))
    val vE = AtomicPublish.setPartitionSpec(spark, root, "d",
      Seq("lang")).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mk(40 until 80).repartition(1)),
      parent = Some(vE))
    val m = AtomicPublish.currentManifestMeta(spark, root).get._2("d")
    assert(m.partitionCols == Seq("lang"))
    assert(m.ownerParts == Map(v1 -> Nil), m.ownerParts)
    // the appended owner is laid out lang=…/; the old one is flat
    val newOwner = m.owners.last
    val dirs = new java.io.File(s"$root/v_$newOwner/d").listFiles()
      .map(_.getName).filter(_.contains("=")).sorted.toSeq
    assert(dirs == Seq("lang=de", "lang=en"), dirs)
    val t = AtomicPublish.readTable(spark, root, "d")
    assert(t.columns.toSeq == Seq("id", "lang", "payload"))
    assert(t.count() == 80)
    // exact values from BOTH classes (file-sourced and dir-sourced)
    val got = t.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = (0 until 80).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", s"p$i")).toSet
    assert(got == want)
    // a lang predicate: exact rows; the dir-laid class takes it as a
    // PARTITION filter (scan metadata says so)
    val en = t.filter(col("lang") === "en")
    assert(en.count() == 40)
    val partScans = scans(en).filter(
      _.metadata.get("PartitionFilters").exists(_.contains("lang")))
    assert(partScans.nonEmpty,
      scans(en).map(_.metadata.getOrElse("PartitionFilters", "?")))
  }

  test("identity OUT: (lang)-partitioned birth, evolve to flat, " +
      "append — the old class serves lang from dirs, the new from " +
      "files; aggregation by lang exact") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root,
      Map("d" -> mk(0 until 40).repartition(1)),
      partitionBy = Map("d" -> Seq("lang")))
    val vE = AtomicPublish.setPartitionSpec(spark, root, "d", Nil).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mk(40 until 80).repartition(1)),
      parent = Some(vE))
    val t = AtomicPublish.readTable(spark, root, "d")
    assert(t.count() == 80)
    val agg = t.groupBy("lang").agg(count(lit(1)).as("n"),
      sum(col("id")).as("s")).orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = (0 until 80).map(i =>
      (if (i % 2 == 0) "en" else "de", i.toLong))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (l, xs) => (l, xs.size.toLong, xs.map(_._2).sum) }
    assert(agg == want, agg)
  }

  test("composes with calendar transforms and time travel; compaction " +
      "normalizes back to one class") {
    val root = freshRoot()
    val mkTs = (ids: Range) => ids.map(i => (i.toLong,
      if (i % 2 == 0) "en" else "de",
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        i.toLong * 21600)))).toDF("id", "lang", "ts")
    val v1 = AtomicPublish.publish(spark, root,
      Map("d" -> mkTs(0 until 40).repartition(1)),
      partitionBy = Map("d" -> Seq("days(ts)")))
    val vE = AtomicPublish.setPartitionSpec(spark, root, "d",
      Seq("lang", "days(ts)")).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mkTs(40 until 80).repartition(1)),
      parent = Some(vE))
    val t = AtomicPublish.readTable(spark, root, "d")
    assert(t.count() == 80)
    // one raw-ts predicate prunes BOTH classes' day dirs; lang exact
    val win = t.filter(
      col("ts") >= lit("1970-01-03 00:00:00").cast("timestamp") &&
        col("ts") < lit("1970-01-08 00:00:00").cast("timestamp"))
    assert(win.count() == 20)
    assert(win.filter(col("lang") === "en").count() == 10)
    // time travel to the pre-evolution shape: one class, old spec
    val old = AtomicPublish.readTableAt(spark, root, "d", v1)
    assert(old.count() == 40)
    // compaction rewrites everything under the CURRENT spec — one
    // class again, bookkeeping cleared
    Compaction.compactStore(spark, root, "d")
    val mC = AtomicPublish.currentManifestMeta(spark, root).get._2("d")
    assert(mC.ownerParts.isEmpty, mC.ownerParts)
    assert(AtomicPublish.readTable(spark, root, "d").count() == 80)
    val dirs = new java.io.File(s"$root/v_${mC.owners.head}/d")
      .listFiles().map(_.getName).filter(_.contains("=")).sorted.toSeq
    assert(dirs == Seq("lang=de", "lang=en"), dirs)
  }

  test("merge-on-read deletes stay exact across identity classes") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root,
      Map("d" -> mk(0 until 40).repartition(1)))
    val vE = AtomicPublish.setPartitionSpec(spark, root, "d",
      Seq("lang")).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mk(40 until 80).repartition(1)),
      parent = Some(vE))
    // delete ids from BOTH classes in one commit
    AtomicPublish.deleteRows(spark, root,
      Map("d" -> Seq(0L, 1L, 40L, 41L).toDF("id")))
    val t = AtomicPublish.readTable(spark, root, "d")
    assert(t.count() == 76)
    assert(t.filter(col("id").isin(0L, 1L, 40L, 41L)).count() == 0)
  }

  test("format-face leaf read refuses a mixed-identity chain by name") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root,
      Map("d" -> mk(0 until 10).repartition(1)))
    val vE = AtomicPublish.setPartitionSpec(spark, root, "d",
      Seq("lang")).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("d" -> mk(10 until 20).repartition(1)),
      parent = Some(vE))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("root", root)
        .option("table", "d").load().count()
    }
    assert(e.getMessage.contains("identity-evolved"), e.getMessage)
  }
}
