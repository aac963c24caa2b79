package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ZONE MAPS on the store: per-segment min/max/null stats recorded in
  * the manifest at publish time, and `readTableWhere` skipping every
  * segment the predicate provably rejects — the data-skipping half of
  * the table format (partitioning is the layout half, StoreLayoutSpec).
  * Equivalence with the unpruned read is asserted for every predicate
  * shape, and pruning is pinned by the FILE SET the query reads. */
class StoreStatsSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("store-stats").resolve("tables").toString

  private def sliceDf(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"payload-$i")).toDF("doc_id", "text")

  /** Owner-segment dirs (v_<txn>) the frame actually reads. */
  private def segmentsRead(df: DataFrame): Set[String] =
    df.inputFiles.flatMap(_.split("/").find(_.startsWith("v_"))).toSet

  /** Three-segment store with disjoint doc_id ranges per segment. */
  private def threeSegments(root: String): Seq[String] = {
    val v1 = AtomicPublish.publish(spark, root,
      Map("docs" -> sliceDf(0 until 100)),
      statsBy = Map("docs" -> Seq("doc_id")))
    val v2 = AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> sliceDf(100 until 200)), parent = Some(v1)).get
    val v3 = AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> sliceDf(200 until 300)), parent = Some(v2)).get
    Seq(v1, v2, v3)
  }

  test("non-manifest-safe meta column names fail fast at publish") {
    // stat/bloom/partition column names serialize raw into line-oriented
    // comma-joined manifest lines: ','/'=' would mis-parse the list, a
    // newline would inject bogus owner entries — rejected up front
    val df = sliceDf(0 until 5)
    intercept[IllegalArgumentException] {
      AtomicPublish.publish(spark, freshRoot(),
        Map("docs" -> df.withColumnRenamed("text", "a,b")),
        statsBy = Map("docs" -> Seq("a,b")))
    }
    intercept[IllegalArgumentException] {
      AtomicPublish.publish(spark, freshRoot(),
        Map("docs" -> df.withColumnRenamed("text", "a\nb")),
        bloomBy = Map("docs" -> Seq("a\nb")))
    }
    intercept[IllegalArgumentException] {
      AtomicPublish.publish(spark, freshRoot(),
        Map("docs" -> df.withColumnRenamed("text", "k=v")),
        partitionBy = Map("docs" -> Seq("k=v")))
    }
  }

  test("zone maps recorded per segment and inherited by appends") {
    val root = freshRoot()
    val Seq(v1, v2, v3) = threeSegments(root)
    val meta = AtomicPublish.manifestMetaOf(spark, root, v3)("docs")
    assert(meta.statCols == Seq("doc_id"))
    assert(meta.segStats.keySet == Set(v1, v2, v3))
    val s1 = meta.segStats(v1)
    assert(s1.rows == 100)
    assert(s1.cols("doc_id") == AtomicPublish.ColStat(Some("0"), Some("99"), 0))
    assert(meta.segStats(v3).cols("doc_id").min.contains("200"))
  }

  test("point and range predicates read only the admitting segments") {
    val root = freshRoot()
    val Seq(v1, v2, v3) = threeSegments(root)
    val point = AtomicPublish.readTableWhere(spark, root, "docs",
      "doc_id = 150")
    assert(segmentsRead(point) == Set(s"v_$v2"))
    assert(point.count() == 1)
    val range = AtomicPublish.readTableWhere(spark, root, "docs",
      "doc_id >= 180 AND doc_id < 220")
    assert(segmentsRead(range) == Set(s"v_$v2", s"v_$v3"))
    assert(range.count() == 40)
    val all = AtomicPublish.readTableWhere(spark, root, "docs",
      "doc_id >= 0")
    assert(segmentsRead(all).size == 3)
  }

  test("every predicate shape ≡ the unpruned filter (conservative translation)") {
    val root = freshRoot()
    threeSegments(root)
    val full = AtomicPublish.readTable(spark, root, "docs")
    for (w <- Seq(
      "doc_id = 42",
      "doc_id <> 42", // untranslated shape: must stay conservative
      "150 <= doc_id", // reversed orientation
      "doc_id IN (5, 105, 205)",
      "doc_id BETWEEN 90 AND 110",
      "doc_id IS NULL",
      "doc_id IS NOT NULL",
      "NOT (doc_id < 100)", // NOT is never translated
      "doc_id = 50 OR doc_id = 250",
      "doc_id = 50 OR text = 'payload-250'", // OR with non-stat column
      "text = 'payload-7'", // no stats on text at all
      "doc_id * 2 = 100")) { // arithmetic leaf: untranslated
      val pruned = AtomicPublish.readTableWhere(spark, root, "docs", w)
        .collect().toSet
      val expect = full.where(w).collect().toSet
      assert(pruned == expect, s"mismatch for: $w")
    }
  }

  test("a predicate no segment admits reads nothing and returns empty") {
    val root = freshRoot()
    threeSegments(root)
    val none = AtomicPublish.readTableWhere(spark, root, "docs",
      "doc_id = 99999")
    assert(none.inputFiles.isEmpty)
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("doc_id", "text"))
  }

  test("evolved column: pre-evolution segments prune as all-null") {
    val root = freshRoot()
    val v1 = AtomicPublish.publish(spark, root,
      Map("docs" -> sliceDf(0 until 100)),
      statsBy = Map("docs" -> Seq("doc_id")))
    // the widening append DECLARES the new column as a stat column;
    // v1's zone map is backfilled all-null from the schema proof
    val withScore = (100 until 200)
      .map(i => (i.toLong, s"payload-$i", i * 10L))
      .toDF("doc_id", "text", "score")
    val v2 = AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> withScore), parent = Some(v1),
      statsBy = Map("docs" -> Seq("doc_id", "score"))).get
    // v1 predates `score`: its zone map records it all-null, so a
    // comparison on score skips v1 entirely
    val hit = AtomicPublish.readTableWhere(spark, root, "docs",
      "score >= 1500")
    assert(segmentsRead(hit) == Set(s"v_$v2"))
    assert(hit.count() == 50)
    // IS NULL goes the other way: only v1 qualifies
    val nulls = AtomicPublish.readTableWhere(spark, root, "docs",
      "score IS NULL")
    assert(segmentsRead(nulls) == Set(s"v_$v1"))
    assert(nulls.count() == 100)
  }

  test("timestamp stats are timezone-independent (epoch-micros encoding)") {
    val root = freshRoot()
    def tsDf(offs: Range) = offs
      .map(i => (i.toLong, new Timestamp(1700000000000L + i * 60000L)))
      .toDF("doc_id", "ts")
    val v1 = AtomicPublish.publish(spark, root,
      Map("ev" -> tsDf(0 until 50)), statsBy = Map("ev" -> Seq("ts")))
    AtomicPublish.publishDelta(spark, root,
      append = Map("ev" -> tsDf(1000 until 1050)), parent = Some(v1))
    val meta = AtomicPublish.currentManifestMeta(spark, root).get._2("ev")
    // recorded as digits (epoch micros), not a rendered local time
    assert(meta.segStats.values.forall(
      _.cols("ts").min.get.forall(_.isDigit)))
    val cut = new Timestamp(1700000000000L + 999 * 60000L)
    val late = AtomicPublish.readTableWhere(spark, root, "ev",
      s"ts > TIMESTAMP '$cut'")
    assert(segmentsRead(late).size == 1)
    assert(late.count() == 50)
  }

  test("string stats survive manifest round-trip with hostile characters") {
    val root = freshRoot()
    val hostile = Seq(
      (1L, "line\nbreak"), (2L, "quote\"and\\slash"), (3L, "émoji ⚡ text"))
      .toDF("doc_id", "text")
    AtomicPublish.publish(spark, root, Map("docs" -> hostile),
      statsBy = Map("docs" -> Seq("doc_id", "text")))
    val meta = AtomicPublish.currentManifestMeta(spark, root).get._2("docs")
    val st = meta.segStats.values.head.cols("text")
    assert(st.min.contains("line\nbreak"))
    assert(st.max.contains("émoji ⚡ text"))
    val got = AtomicPublish.readTableWhere(spark, root, "docs",
      "text = 'line\nbreak'").collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }

  test("empty appended segment is prunable; all-pruned IN-list reads nothing") {
    val root = freshRoot()
    val Seq(v1, _, _) = threeSegments(root)
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> sliceDf(0 until 0)),
      parent = Some(AtomicPublish.currentTxn(spark, root).get))
    val hit = AtomicPublish.readTableWhere(spark, root, "docs",
      "doc_id IN (3, 7)")
    assert(segmentsRead(hit) == Set(s"v_$v1"))
    assert(hit.count() == 2)
  }

  test("compaction preserves stat columns and recomputes the zone map") {
    val root = freshRoot()
    threeSegments(root)
    val (ctxn, _) = Compaction.compactStore(spark, root, "docs")
    val meta = AtomicPublish.manifestMetaOf(spark, root, ctxn)("docs")
    assert(meta.statCols == Seq("doc_id"))
    assert(meta.owners == Seq(ctxn))
    assert(meta.segStats(ctxn).rows == 300)
    assert(meta.segStats(ctxn).cols("doc_id") ==
      AtomicPublish.ColStat(Some("0"), Some("299"), 0))
    // post-compaction predicate still equivalent
    assert(AtomicPublish.readTableWhere(spark, root, "docs",
      "doc_id < 10").count() == 10)
  }

  test("time travel prunes against the pinned version's zone map") {
    val root = freshRoot()
    val Seq(v1, v2, _) = threeSegments(root)
    val at2 = AtomicPublish.readTableAtWhere(spark, root, "docs", v2,
      "doc_id >= 150")
    assert(segmentsRead(at2) == Set(s"v_$v2"))
    assert(at2.count() == 50)
    // the third segment does not exist at v2 even for a wide predicate
    assert(segmentsRead(AtomicPublish.readTableAtWhere(spark, root, "docs",
      v2, "doc_id >= 0")) == Set(s"v_$v1", s"v_$v2"))
  }

  test("registerViews mounts a consistent SQL snapshot; re-register advances") {
    val root = freshRoot()
    val v1 = AtomicPublish.publish(spark, root, Map(
      "docs" -> sliceDf(0 until 50),
      "marks" -> Seq((1L, "keep"), (2L, "drop")).toDF("doc_id", "verdict")))
    val pinned = AtomicPublish.registerViews(spark, root, prefix = "st_")
    assert(pinned == v1)
    // SQL joins across the mounted views
    assert(spark.sql(
      """SELECT count(*) FROM st_docs d JOIN st_marks m ON d.doc_id = m.doc_id
        |WHERE m.verdict = 'keep'""".stripMargin).head().getLong(0) == 1L)
    // a newer publish does NOT move the mounted snapshot...
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> sliceDf(50 until 80)), parent = Some(v1))
    assert(spark.sql("SELECT count(*) FROM st_docs").head().getLong(0) == 50L)
    // ...until re-registered (and time travel mounts v1 again)
    AtomicPublish.registerViews(spark, root, prefix = "st_")
    assert(spark.sql("SELECT count(*) FROM st_docs").head().getLong(0) == 80L)
    AtomicPublish.registerViews(spark, root, prefix = "old_", txn = Some(v1))
    assert(spark.sql("SELECT count(*) FROM old_docs").head().getLong(0) == 50L)
  }

  test("numeric coercion of a string stat column never prunes (order mismatch)") {
    val root = freshRoot()
    // string-ordered min/max of {"9","100"} is ("100","9") — no envelope
    // under the NUMERIC order Spark coerces `s > 50` into
    val df = Seq((1L, "9"), (2L, "100")).toDF("doc_id", "s")
    AtomicPublish.publish(spark, root, Map("t" -> df),
      statsBy = Map("t" -> Seq("s")))
    val hit = AtomicPublish.readTableWhere(spark, root, "t", "s > 50")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // same-type comparison still translates and prunes correctly
    assert(AtomicPublish.readTableWhere(spark, root, "t", "s = 'zzz'")
      .inputFiles.isEmpty)
  }

  test("stats on a string partition column keep declared types (no inference)") {
    val root = freshRoot()
    // numeric-looking partition values: a bare read would infer int 1/2
    val df = Seq((1L, "01"), (2L, "01"), (3L, "02"))
      .toDF("doc_id", "part")
    AtomicPublish.publish(spark, root, Map("t" -> df),
      partitionBy = Map("t" -> Seq("part")),
      statsBy = Map("t" -> Seq("part")))
    val meta = AtomicPublish.currentManifestMeta(spark, root).get._2("t")
    assert(meta.segStats.values.head.cols("part") ==
      AtomicPublish.ColStat(Some("01"), Some("02"), 0))
    val hit = AtomicPublish.readTableWhere(spark, root, "t", "part = '01'")
    assert(hit.count() == 2)
  }

  test("zone-map skipping composes with partition pruning on one read") {
    val root = freshRoot()
    def slice(ids: Range) = ids
      .map(i => (i.toLong, s"p$i", (i % 4))).toDF("doc_id", "text", "cell")
    val v1 = AtomicPublish.publish(spark, root, Map("t" -> slice(0 until 100)),
      partitionBy = Map("t" -> Seq("cell")),
      statsBy = Map("t" -> Seq("doc_id")))
    val v2 = AtomicPublish.publishDelta(spark, root,
      append = Map("t" -> slice(100 until 200)), parent = Some(v1)).get
    // doc_id range skips the v1 SEGMENT (zone map); cell filter prunes
    // PARTITIONS inside the surviving segment (scan-level)
    val hit = AtomicPublish.readTableWhere(spark, root, "t",
      "doc_id >= 100 AND cell = 2")
    assert(hit.inputFiles.nonEmpty &&
      hit.inputFiles.forall(f => f.contains(s"v_$v2")))
    hit.collect()
    val plan = (hit.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    assert(hit.count() == 25)
    assert(hit.collect().toSet ==
      AtomicPublish.readTable(spark, root, "t")
        .where("doc_id >= 100 AND cell = 2").collect().toSet)
  }

  test("'@' table names are rejected (the #stats key delimiter)") {
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      AtomicPublish.publish(spark, root,
        Map("a@b" -> Seq(1L).toDF("id")))
    }
    assert(e.getMessage.contains("manifest-safe"))
  }

  test("changesSince: appended segments only; replace signals a fallback") {
    val root = freshRoot()
    val Seq(v1, v2, v3) = threeSegments(root)
    // v1 → v3 gained exactly the v2+v3 slices
    val d = AtomicPublish.changesSince(spark, root, "docs", v1).get
    assert(d.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (100L until 300L).toSet)
    // bounded upper end: v1 → v2
    val d12 = AtomicPublish.changesSince(spark, root, "docs", v1, Some(v2)).get
    assert(d12.count() == 100)
    // no change: empty frame with the table schema
    val none = AtomicPublish.changesSince(spark, root, "docs", v3).get
    assert(none.count() == 0 && none.columns.toSeq == Seq("doc_id", "text"))
    // a COMPACTION is a reorganization commit (r10, dataChange=false):
    // the feed rides through it — the same appended rows, served from
    // their ORIGINAL segments, not re-derived from the rewrite
    Compaction.compactStore(spark, root, "docs")
    val rode = AtomicPublish.changesSince(spark, root, "docs", v1).get
    assert(rode.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (100L until 300L).toSet)
    // a DATA-CHANGING replace still signals the fallback → None
    val v4 = AtomicPublish.currentTxn(spark, root).get
    AtomicPublish.publishDelta(spark, root, append = Map.empty,
      replace = Map("docs" ->
        Seq(999L -> "rw").toDF("doc_id", "text")),
      parent = Some(v4)).get
    assert(AtomicPublish.changesSince(spark, root, "docs", v1).isEmpty)
  }

  test("randomized predicates: readTableWhere ≡ unpruned filter (fuzz)") {
    val root = freshRoot()
    val rnd = new scala.util.Random(42)
    // three segments over mixed types incl. nulls and numeric-looking
    // strings (the coercion trap), randomized but seeded
    def seg(n: Int) = (1 to 60).map { _ =>
      (rnd.nextInt(1000).toLong,
        if (rnd.nextBoolean()) rnd.nextInt(200).toString else s"w${rnd.nextInt(50)}",
        if (rnd.nextInt(10) == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(rnd.nextInt(100) / 7.0))
    }.toDF("id", "s", "x")
    val v1 = AtomicPublish.publish(spark, root, Map("t" -> seg(0)),
      statsBy = Map("t" -> Seq("id", "s", "x")))
    val v2 = AtomicPublish.publishDelta(spark, root,
      append = Map("t" -> seg(1)), parent = Some(v1)).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("t" -> seg(2)), parent = Some(v2))
    val full = AtomicPublish.readTable(spark, root, "t")
    // NB: string-vs-numeric comparisons (s > 100) are NOT valid fuzz
    // predicates here — ANSI mode makes the REFERENCE filter itself
    // throw on non-numeric strings; the committed {"9","100"} coercion
    // regression covers that translation path on all-numeric data
    val preds = Seq(
      "id = 500", "id > 500", "id <= 77", "id BETWEEN 100 AND 200",
      "s = '42'", "s >= '50'", "s IN ('7', 'w7', '150')",
      "x IS NULL", "x IS NOT NULL", "x > 10.0", "x <= 3.5",
      "id > 900 OR s = 'w1'", "id < 50 AND x > 5.0",
      "NOT (id = 3)", "id * 2 > 500", "x <=> NULL",
      "id IN (1, 2, 3) OR x IS NULL") ++
      (1 to 20).map(_ => rnd.nextInt(4) match {
        case 0 => s"id ${Seq("=", ">", "<", ">=", "<=")(rnd.nextInt(5))} ${rnd.nextInt(1100)}"
        case 1 => s"s = '${rnd.nextInt(250)}'"
        case 2 => s"x ${Seq(">", "<")(rnd.nextInt(2))} ${rnd.nextInt(15)}.${rnd.nextInt(10)}"
        case 3 => s"id > ${rnd.nextInt(900)} AND s >= 'w${rnd.nextInt(40)}'"
      })
    preds.foreach { p =>
      val pruned = AtomicPublish.readTableWhere(spark, root, "t", p)
        .collect().toSet
      val expect = full.where(p).collect().toSet
      assert(pruned == expect, s"fuzz mismatch for: $p")
    }
  }

  test("unsupported stat column types fail fast at publish") {
    val root = freshRoot()
    val arr = Seq((1L, Seq(1.0, 2.0))).toDF("doc_id", "vec")
    val e = intercept[IllegalArgumentException] {
      AtomicPublish.publish(spark, root, Map("t" -> arr),
        statsBy = Map("t" -> Seq("vec")))
    }
    assert(e.getMessage.contains("zone map"))
  }
}
