package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** SQL maintenance procedures ([[GraftProcedures]] via
  * [[GraftCatalog]]'s `ProcedureCatalog` face): `CALL
  * <cat>.system.compact/vacuum/history/consumers(...)` must run the
  * SAME maintenance operations the Scala API exposes and return their
  * summary rows as the statement result — so a SQL-only session can
  * operate the store end to end (create → insert → maintain). */
class StoreProcedureSpec extends SparkSuite {
  import spark.implicits._

  private var n = 0
  private def mount(root: String): String = {
    n += 1
    val name = s"graftproc$n"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  private def freshRoot(): String =
    Files.createTempDirectory("storeproc").resolve("store").toString

  private def docs(ids: Range, lang: String): DataFrame =
    ids.map(i => (i.toLong, lang, s"text-$i")).toDF("doc_id", "lang", "text")

  /** Multi-owner store: three appended segments. */
  private def stage(root: String): Unit = {
    val v1 = AtomicPublish.publish(spark, root,
      Map("docs" -> docs(0 until 100, "en")),
      statsBy = Map("docs" -> Seq("doc_id")))
    val v2 = AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(100 until 200, "de")),
      parent = Some(v1)).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(200 until 300, "fr")),
      parent = Some(v2))
  }

  test("CALL compact consolidates owners and preserves rows") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    val row = spark.sql(
      s"CALL $cat.system.compact(table => 'docs')").collect()
    assert(row.length == 1)
    assert(row(0).getAs[Int]("owners_before") == 3)
    assert(row(0).getAs[Int]("owners_after") == 1)
    val version = row(0).getAs[String]("version")
    assert(AtomicPublish.currentTxn(spark, root).contains(version))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 300)
  }

  test("CALL compact applies tombstones and records clustering") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    spark.sql(s"DELETE FROM $cat.docs WHERE doc_id >= 250")
    spark.sql(s"CALL $cat.system.compact(table => 'docs', " +
      "cluster_by => 'doc_id', target_file_mb => 1)").collect()
    val txn = AtomicPublish.currentTxn(spark, root).get
    val metas = AtomicPublish.manifestMetaOf(spark, root, txn)
    // the rewrite IS the physical delete: tombstone companion cleared
    assert(AtomicPublish.readTable(spark, root,
      AtomicPublish.deleteTableOf("docs")).count() == 0)
    assert(metas("docs").clusterCols == Seq("doc_id"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 250)
  }

  test("CALL compact(minor => true) merges the small tail and carries " +
      "the head by reference; no-op tail returns partitions = 0") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root,
      Map("docs" -> docs(0 until 5000, "en")))
    (0 until 3).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> docs(5000 + k * 20 until 5020 + k * 20,
          "de")),
        parent = AtomicPublish.currentTxn(spark, root))
    }
    val cat = mount(root)
    // target 1 MB: the 5000-row head is... still under 1 MB — use the
    // row-scaled target the tail spec uses (procedure takes MB, so
    // assert the semantics through the owner-chain shape instead)
    val row = spark.sql(s"CALL $cat.system.compact(" +
      "table => 'docs', minor => true, target_file_mb => 1)").head()
    // everything is tiny at 1 MB → the whole chain IS the tail
    assert(row.getAs[Int]("owners_after") == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 5060)
    // immediately after: single owner → no mergeable tail → no-op row
    val noop = spark.sql(s"CALL $cat.system.compact(" +
      "table => 'docs', minor => true, target_file_mb => 1)").head()
    assert(noop.getAs[Int]("partitions") == 0)
    assert(noop.getAs[Int]("owners_after") == 1)
    // clustering composes only with the full rewrite
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.compact(table => 'docs', " +
        "minor => true, cluster_by => 'doc_id')").collect()
    }
    assert(e.getMessage.contains("full rewrite") ||
      Option(e.getCause).exists(_.getMessage.contains("full rewrite")))
  }

  test("CALL history lists commits newest-first; versions time-travel") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    val rows = spark.sql(s"CALL $cat.system.history(limit => 10)")
      .collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Boolean]("is_live"))
    assert(rows.drop(1).forall(!_.getAs[Boolean]("is_live")))
    // newest-first ordering by commit time
    val times = rows.map(_.getAs[Long]("committed_at_ms")).toSeq
    assert(times == times.sorted.reverse)
    // the OLDEST version serves the first segment only
    val oldest = rows.last.getAs[String]("version")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs " +
      s"VERSION AS OF '$oldest'").head().getLong(0) == 100)
    // default limit works too (positional arg)
    assert(spark.sql(s"CALL $cat.system.history()").collect().length == 3)
  }

  test("CALL vacuum reclaims aged history; live data survives") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    assert(AtomicPublish.committedVersions(spark, root).size == 3)
    // append-only history is fully referenced by the live version
    // (reference closure) — nothing is reclaimable yet, and vacuum
    // must say so rather than break the chain
    val noop = spark.sql(s"CALL $cat.system.vacuum(" +
      "keep_last => 1, grace_ms => CAST(0 AS BIGINT))")
      .head().getAs[Int]("reclaimed")
    assert(noop == 0)
    // after compaction the live version is self-contained: the three
    // appended versions' dirs age out and CALL vacuum reclaims them
    spark.sql(s"CALL $cat.system.compact(table => 'docs')").collect()
    // dry_run first: reports the SAME reclaimable count, deletes
    // NOTHING (the ops pre-flight)
    val preview = spark.sql(s"CALL $cat.system.vacuum(" +
      "keep_last => 1, grace_ms => CAST(0 AS BIGINT), " +
      "dry_run => true)").head()
    assert(preview.getAs[Boolean]("dry_run"))
    assert(preview.getAs[Int]("reclaimed") > 0)
    assert(AtomicPublish.committedVersions(spark, root).size == 4,
      "dry_run must not delete")
    val reclaimed = spark.sql(s"CALL $cat.system.vacuum(" +
      "keep_last => 1, grace_ms => CAST(0 AS BIGINT))")
      .head().getAs[Int]("reclaimed")
    assert(reclaimed == preview.getAs[Int]("reclaimed"),
      "the real run must reclaim exactly what the preview reported")
    assert(AtomicPublish.committedVersions(spark, root).size == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 300)
  }

  test("CALL consumers shows registered checkpoints with lag") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    val versions = AtomicPublish.committedVersions(spark, root).map(_._1)
    AtomicPublish.recordConsumer(spark, root, "ckpt-a", versions.head)
    AtomicPublish.recordConsumer(spark, root, "ckpt-b", versions.last)
    AtomicPublish.recordConsumer(spark, root, "ckpt-gone", "v_not_there")
    val rows = spark.sql(s"CALL $cat.system.consumers()").collect()
      .map(r => r.getAs[String]("consumer_id") ->
        Option(r.getAs[Integer]("commits_behind"))).toMap
    assert(rows.keySet == Set("ckpt-a", "ckpt-b", "ckpt-gone"))
    assert(rows("ckpt-a").map(_.intValue).contains(versions.size - 1))
    assert(rows("ckpt-b").map(_.intValue).contains(0))
    assert(rows("ckpt-gone").isEmpty) // vacuumed away → resync on restart
  }

  test("CALL restore rolls a table back as a new commit; history " +
      "stays time-travelable both ways") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    val v2 = AtomicPublish.committedVersions(spark, root).map(_._1)(1)
    spark.sql(s"DELETE FROM $cat.docs WHERE doc_id < 150")
    val deleted = AtomicPublish.currentTxn(spark, root).get
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 150)
    // roll back to v2 (two segments, no deletes): O(1) metadata commit
    val row = spark.sql(s"CALL $cat.system.restore(" +
      s"table => 'docs', version => '$v2')").head()
    assert(row.getAs[String]("restored_from") == v2)
    assert(row.getAs[Int]("owners") == 2)
    val restoredTxn = row.getAs[String]("version")
    assert(AtomicPublish.currentTxn(spark, root).contains(restoredTxn))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 200)
    // the tombstone companion went with the rollback — no resurrected
    // delete state (v2 predates the first delete, so no companion at all)
    assert(!AtomicPublish.manifestMetaOf(spark, root, restoredTxn)
      .contains(AtomicPublish.deleteTableOf("docs")))
    // history is append-only: the pre-restore (deleted) state still
    // time-travels, and so does the pre-delete one
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs " +
      s"VERSION AS OF '$deleted'").head().getLong(0) == 150)
    // rolling FORWARD to the deleted state is just another restore
    spark.sql(s"CALL $cat.system.restore(" +
      s"table => 'docs', version => '$deleted')").collect()
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 150)
  }

  test("restore resurrects a dropped table (the DROP undo)") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    val preDrop = AtomicPublish.currentTxn(spark, root).get
    spark.sql(s"DROP TABLE $cat.docs")
    assert(!spark.catalog.tableExists(s"$cat.docs"))
    spark.sql(s"CALL $cat.system.restore(" +
      s"table => 'docs', version => '$preDrop')").collect()
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 300)
  }

  test("restore refuses a target whose segments left retention; " +
      "unknown targets are named") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    val oldest = AtomicPublish.committedVersions(spark, root).map(_._1).head
    // compaction rewrites the chain; vacuum then reclaims the three
    // appended versions' dirs — the restore target is gone
    spark.sql(s"CALL $cat.system.compact(table => 'docs')").collect()
    AtomicPublish.vacuum(spark, root, keepLast = 1, graceMs = 0)
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.restore(" +
        s"table => 'docs', version => '$oldest')").collect()
    }
    def mentionsVacuum(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(m =>
        m.contains("reclaimed") || m.contains("vacuum")) ||
        mentionsVacuum(t.getCause))
    assert(mentionsVacuum(e))
    // the failed restore committed nothing
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.docs")
      .head().getLong(0) == 300)
    val live = AtomicPublish.currentTxn(spark, root).get
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.restore(" +
        s"table => 'nope', version => '$live')").collect()
    }
    assert(e2.getMessage.contains("nope") ||
      Option(e2.getCause).exists(_.getMessage.contains("nope")))
  }

  test("store9 oracle query: the rollback lifecycle ends at exactly " +
      "the pristine source state") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.analytics.AdvancedQueries
      .store9CatalogRestore(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val want = graft.core.Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.count("*").as("n_docs"),
        org.apache.spark.sql.functions.sum("doc_id").as("sum_id"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text"))).as("n_chars"))
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want)
  }

  test("CALL detail: one-row summary — footprint, layout, checks, " +
      "tombstone debt") {
    import spark.implicits._
    val root = freshRoot()
    AtomicPublish.publish(spark, root,
      Map("docs" -> docs(0 until 200, "en")),
      statsBy = Map("docs" -> Seq("doc_id")),
      bucketBy = Map("docs" -> (Seq("doc_id"), 4)),
      checks = Map("docs" -> Map("pos_id" -> "doc_id >= 0")))
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(200 until 300, "de")),
      parent = AtomicPublish.currentTxn(spark, root))
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(7L).toDF("doc_id")))
    val cat = mount(root)
    val row = spark.sql(s"CALL $cat.system.detail(table => 'docs')").head()
    assert(row.getAs[String]("table") == "docs")
    assert(row.getAs[Int]("owners") == 2)
    assert(row.getAs[Int]("files") > 0 && row.getAs[Long]("bytes") > 0)
    assert(row.getAs[Long]("rows") == 300L) // raw, pre-tombstone
    assert(row.getAs[String]("buckets") == "4:doc_id")
    assert(row.getAs[String]("checks") == "pos_id: doc_id >= 0")
    assert(row.getAs[Int]("tombstone_owners") == 1)
    // what the planner sees (VERDICT-r11 #8): the merged NDV and the
    // merged equi-height histogram per stat column, right in DETAIL
    val ndvStr = row.getAs[String]("column_ndv")
    assert(ndvStr.startsWith("doc_id="), ndvStr)
    val ndv = ndvStr.stripPrefix("doc_id=").toLong
    assert(ndv >= 250 && ndv <= 300, s"merged ndv $ndvStr vs 300 ids")
    val histStr = row.getAs[String]("column_hist")
    assert(histStr.startsWith(
      s"doc_id=${AtomicPublish.HistogramBins}bins["), histStr)
    // the merged span covers both owners' id ranges (0..299)
    assert(histStr.contains("[0.0..299.0]"), histStr)
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.detail(table => 'nope')").collect()
    }
    assert(e.getMessage.contains("nope") ||
      Option(e.getCause).exists(_.getMessage.contains("nope")))
  }

  test("CALL matview: SQL-only incremental view lifecycle — create, " +
      "refresh-on-commit, query, drop with aux state") {
    import spark.implicits._
    val root = freshRoot()
    AtomicPublish.publish(spark, root,
      Map("docs" -> docs(0 until 100, "en")))
    val cat = mount(root)
    def call(): (Option[String], String) = {
      val r = spark.sql(s"CALL $cat.system.matview(view => 'mv_lang', " +
        "source => 'docs', aggs => 'count:doc_id:n,min:doc_id:lo', " +
        "group_by => 'lang')").head()
      (Option(r.getString(1)), r.getString(2))
    }
    // first call: full compute + publish
    val (v1, a1) = call()
    assert(v1.isDefined && a1 == "refreshed")
    assert(spark.sql(s"SELECT n FROM $cat.mv_lang WHERE lang = 'en'")
      .head().getLong(0) == 100)
    // no commits since → current, no-op
    assert(call() == ((None, "current")))
    // a commit lands → the next call refreshes INCREMENTALLY and the
    // view tracks (min state included)
    spark.sql(s"INSERT INTO $cat.docs VALUES (-5, 'en', 'neg')")
    val (v2, a2) = call()
    assert(v2.isDefined && a2 == "refreshed")
    val row = spark.sql(
      s"SELECT n, lo FROM $cat.mv_lang WHERE lang = 'en'").head()
    assert(row.getLong(0) == 101 && row.getLong(1) == -5L)
    // drop removes the view AND its aux state tables
    val dropped = spark.sql(s"CALL $cat.system.drop_matview(" +
      "view => 'mv_lang', aggs => 'count:doc_id:n,min:doc_id:lo')")
      .head().getAs[Int]("dropped")
    assert(dropped >= 2) // view + aux (+ min/max value state)
    val names = AtomicPublish.currentManifestMeta(spark, root).get._2.keySet
    assert(!names.exists(_.startsWith("mv_lang")),
      s"matview tables survived the drop: $names")
  }

  test("CALL history carries OPERATION labels: every commit names " +
      "what it did (DESCRIBE HISTORY-grade observability)") {
    val root = freshRoot()
    stage(root) // CREATE + APPEND + APPEND
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(5L, 6L).toDF("doc_id")))
    AtomicPublish.upsertMany(spark, root, Map("docs" ->
      AtomicPublish.Upsert(docs(0 until 3, "xx"),
        Seq(0L, 1L, 2L).toDF("doc_id"))))
    Compaction.compactStore(spark, root, "docs")
    val cat = mount(root)
    val ops = spark.sql(s"CALL $cat.system.history()").collect()
      .map(r => Option(r.getString(3)).getOrElse("")).toSeq
    assert(ops.take(5) == Seq("COMPACT docs", "UPSERT docs",
      "DELETE docs", "APPEND", "APPEND"), ops)
    assert(ops.last == "CREATE", ops)
  }

  test("SHOW PROCEDURES lists the surface; unknown CALL is refused") {
    val root = freshRoot(); stage(root)
    val cat = mount(root)
    val listed = spark.sql(s"SHOW PROCEDURES IN $cat.system").collect()
      .map(_.getAs[String]("procedure_name")).toSet
    assert(listed == Set("analyze", "compact", "vacuum", "history",
      "consumers", "restore", "add_check", "drop_check", "detail",
      "clone", "matview", "drop_matview", "set_partition_spec",
      "trim_cdf"))
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.rewrite_everything()").collect()
    }
    assert(err.getMessage.contains("rewrite_everything"))
  }
}
