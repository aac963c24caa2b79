package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** RUNTIME pruning of store-table scans from a selective dimension
  * join — the verdict-r9 #5 pin, both halves:
  *
  *  - IDENTITY partitions: Spark's own dynamic partition pruning works
  *    unmodified through the [[GraftFileIndex]] mount (the V1Scan
  *    bridge structurally can't forward it — the native mount is what
  *    buys it), because the identity column sits in the relation's
  *    `partitionSchema`.
  *  - HIDDEN (calendar-transform) partitions: the join key is a DATA
  *    column, invisible to Spark's rule — [[HiddenPartitionPruning]]
  *    closes the gap by keying a [[org.apache.spark.sql.catalyst
  *    .expressions.DynamicPruningSubquery]] on the exposed derived
  *    ordinal. Fact day-directories whose ordinal no dim row derives
  *    are never listed into the scan.
  *
  * Assertions are structural (a `dynamicpruning` filter in the
  * executed fact scan) AND behavioral (the scan's `numFiles` metric
  * counts fewer files than the table holds, with one file pinned per
  * directory) AND semantic (row parity with an unpruned control). */
class StoreDppSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("store").toString

  /** The file scans of an executed plan, descending into AQE query
    * stages (QueryStageExec is a LEAF — a bare collect misses every
    * scan of a multi-stage join plan). */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    }.flatten

  private def factScans(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    allScans(plan)
  }

  /** A small parquet-backed dim (NOT a local relation: Catalyst folds
    * Filter-over-LocalRelation eagerly, and the rule's selectivity
    * gate needs the Filter node to survive). */
  private def parquetDim(df: DataFrame, name: String): DataFrame = {
    val p = Files.createTempDirectory(name).resolve("dim").toString
    df.write.parquet(p)
    spark.read.parquet(p)
  }

  test("identity partitions: Spark's own DPP prunes store dirs from a dim join") {
    val root = freshRoot("dpp-identity")
    // 12 cells, one file per cell dir
    val fact = (0 until 1200).map(i => (i.toLong, i % 12, s"v$i"))
      .toDF("id", "cell", "payload").repartition(1)
    AtomicPublish.publish(spark, root, Map("fact" -> fact),
      partitionBy = Map("fact" -> Seq("cell")))
    val dim = parquetDim(
      (0 until 12).map(c => (c, if (c < 3) "hot" else "cold"))
        .toDF("cell", "tag"), "dpp-identity-dim")
      .filter(col("tag") === "hot")
    val joined = AtomicPublish.readTable(spark, root, "fact")
      .join(dim, "cell")
    val scans = factScans(joined)
    val factScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("v_"))).getOrElse(fail(s"no fact scan in $scans"))
    assert(factScan.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      factScan.partitionFilters.mkString(", "))
    assert(factScan.metrics("numFiles").value == 3,
      s"expected 3 of 12 cell dirs read, got ${factScan.metrics("numFiles").value}")
    assert(joined.count() == 300)
  }

  test("hidden days(ts) partitions: dim join values prune day dirs at runtime") {
    val root = freshRoot("dpp-hidden")
    // 20 UTC days, 24 rows/day, one file per day dir
    val fact = ((0 until 480).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(i.toLong * 3600)), s"p$i")
    } ++ Seq((9001L, null.asInstanceOf[java.sql.Timestamp], "nul"),
      (9002L, null.asInstanceOf[java.sql.Timestamp], "nul")))
      .toDF("id", "ts", "payload").repartition(1)
    AtomicPublish.publish(spark, root, Map("fact" -> fact),
      partitionBy = Map("fact" -> Seq("days(ts)")))
    // dim: one row per fact hour on 2 hot days (days 4 and 11) plus
    // cold rows the selective filter removes
    val dimRows = (0 until 480).filter(i => i / 24 == 4 || i / 24 == 11)
      .map(i => (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(i.toLong * 3600)), "hot")) ++
      Seq((java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(99L * 86400)), "cold"))
    val dim = parquetDim(dimRows.toDF("ts", "tag"), "dpp-hidden-dim")
      .filter(col("tag") === "hot")
    val factTable = AtomicPublish.readTable(spark, root, "fact")
    val joined = factTable.join(dim, "ts")
    val scans = factScans(joined)
    val factScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("v_"))).getOrElse(fail(s"no fact scan in $scans"))
    assert(factScan.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      s"no dynamic pruning filter on the fact scan: " +
        factScan.partitionFilters.mkString(", "))
    // 2 of 20 day dirs survive; the null-ts dir (__HIVE_DEFAULT_
    // PARTITION__) is dropped too — a null source value can never
    // satisfy the equi-join, so pruning it is sound, and this pins it
    assert(factScan.metrics("numFiles").value == 2,
      s"expected 2 of 21 dirs read, got ${factScan.metrics("numFiles").value}")
    // semantic parity with the unpruned control
    assert(joined.count() == 48)
    val control = factTable.join(dim.hint("shuffle_hash"), "ts").count()
    assert(control == 48)
  }

  test("hidden DPP composes with the data-filter skipping layers: a " +
      "static id predicate (zone maps) and the dynamic day filter " +
      "fire on ONE scan") {
    val root = freshRoot("dpp-compose")
    val fact = (0 until 480).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(i.toLong * 3600)), s"p$i")
    }.toDF("id", "ts", "payload").repartition(1)
    AtomicPublish.publish(spark, root, Map("fact" -> fact),
      partitionBy = Map("fact" -> Seq("days(ts)")),
      statsBy = Map("fact" -> Seq("id")))
    val dim = parquetDim(
      (0 until 480).filter(i => i / 24 == 4 || i / 24 == 11)
        .map(i => (java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(i.toLong * 3600)), "hot"))
        .toDF("ts", "tag"), "dpp-compose-dim")
      .filter(col("tag") === "hot")
    // static predicate keeps only day 11's id range; the dim's days
    // are {4, 11} — the scan must carry BOTH the pushed data filter
    // and the dynamic partition filter, and the answer is their
    // intersection
    val joined = AtomicPublish.readTable(spark, root, "fact")
      .filter(col("id") >= 264L) // day 11 starts at id 264
      .join(dim, "ts")
    val factScan = factScans(joined).find(_.metadata.get("Location")
      .exists(_.contains("v_"))).getOrElse(fail("no fact scan"))
    assert(factScan.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      factScan.partitionFilters.mkString(", "))
    assert(factScan.metadata.get("PushedFilters")
      .exists(_.contains("GreaterThanOrEqual(id")),
      factScan.metadata.get("PushedFilters").toString)
    assert(joined.count() == 24) // day 11 only: day 4 fails the id cut
  }

  test("catalog SQL face: hidden-partition DPP fires through the " +
      "native-read rule (extension session)") {
    val root = freshRoot("dpp-catalog")
    val fact = (0 until 240).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(i.toLong * 3600)), s"p$i")
    }.toDF("id", "ts", "payload").repartition(1)
    AtomicPublish.publish(spark, root, Map("fact" -> fact),
      partitionBy = Map("fact" -> Seq("days(ts)")))
    val dimPath = java.nio.file.Files.createTempDirectory("dpp-cat-dim")
      .resolve("dim").toString
    ((0 until 240).filter(i => i / 24 == 3)
      .map(i => (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(i.toLong * 3600)), "hot")) ++
      Seq((java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(999L * 3600)), "cold")))
      .toDF("ts", "tag").write.parquet(dimPath)
    // a second session over the shared context, WITH the extensions —
    // the native-read rule rewrites the catalog read to the
    // GraftFileIndex mount, whose construction registers the DPP rule
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2: SparkSession =
      try SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(
          new org.apache.spark.sql.graftvec.GraftSqlExtensions()(_))
        .getOrCreate()
      finally {
        SparkSession.setActiveSession(prev)
        SparkSession.setDefaultSession(prev)
      }
    val cat = "dppcat"
    s2.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$cat.root", root)
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(s2)
    try {
      s2.read.parquet(dimPath).createOrReplaceTempView("dpp_dim")
      val joined = s2.sql(
        s"""SELECT count(*) AS n FROM $cat.fact f
           |JOIN (SELECT ts FROM dpp_dim WHERE tag = 'hot') d
           |  ON f.ts = d.ts""".stripMargin)
      val scans = factScans(joined)
      val factScan = scans.find(_.metadata.get("Location")
        .exists(_.contains("v_")))
        .getOrElse(fail(s"no native fact scan — the read rule did " +
          s"not rewrite: $scans"))
      assert(factScan.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning")),
        factScan.partitionFilters.mkString(", "))
      assert(factScan.metrics("numFiles").value == 1,
        s"expected 1 of 10 day dirs, got ${factScan.metrics("numFiles").value}")
      assert(joined.collect()(0).getLong(0) == 24)
    } finally prevActive.foreach(SparkSession.setActiveSession)
  }

  test("evolved layout: exposure gates off, join still correct (no null-dir drop)") {
    val root = freshRoot("dpp-evolved")
    val mk = (ids: Range) => ids.map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(i.toLong * 3600)), s"p$i")
    }.toDF("id", "ts", "payload").repartition(1)
    AtomicPublish.publish(spark, root, Map("fact" -> mk(0 until 96)),
      partitionBy = Map("fact" -> Seq("days(ts)")))
    val vE = AtomicPublish.setPartitionSpec(spark, root, "fact",
      Seq("months(ts)")).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("fact" -> mk(96 until 192)), parent = Some(vE))
    // mixed day/month layout: derived exposure must gate off — an
    // old owner would surface null at ts__month and a dynamic IN
    // filter would silently drop its rows
    val dim = parquetDim(
      Seq((java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        30L * 3600)), "hot"),
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          150L * 3600)), "hot")).toDF("ts", "tag"), "dpp-evolved-dim")
      .filter(col("tag") === "hot")
    val joined = AtomicPublish.readTable(spark, root, "fact").join(dim, "ts")
    val scans = factScans(joined)
    val factScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("v_"))).getOrElse(fail(s"no fact scan in $scans"))
    assert(!factScan.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      "dynamic pruning must not fire on a mixed-layout chain")
    assert(joined.count() == 2)
  }
}
