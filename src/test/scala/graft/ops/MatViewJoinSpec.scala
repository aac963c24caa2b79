package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** JOIN materialized views and count_distinct aggregates — the two
  * expressiveness frontiers of [[MatView]]: every refresh path
  * (initialize, append either side, append both sides, signed-merge
  * deletes, min/max fallback, replace fallback, no-op) must equal the
  * from-scratch aggregate of the pinned join, and the distinct-value
  * state must un-merge deletes exactly (multiplicity, not presence). */
class MatViewJoinSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("matviewjoin").resolve("tables").toString

  private def docs(ids: Range, lang: String): DataFrame =
    ids.map(i => (i.toLong, lang, i * 10L)).toDF("doc_id", "lang", "words")

  private def langs(rows: (String, String)*): DataFrame =
    rows.toDF("lang", "family")

  private val byFamily = MatView.JoinDef("docs", "langs", Seq("lang"),
    "fam_stats", Seq("family"),
    Seq(MatView.Agg("count", "doc_id", "n_docs"),
      MatView.Agg("sum", "words", "total_words"),
      MatView.Agg("count_distinct", "lang", "n_langs")))

  private def rows(root: String, view: String): Set[org.apache.spark.sql.Row] =
    AtomicPublish.readTable(spark, root, view).collect().toSet

  private def expect(root: String,
      d: MatView.ViewDef): Set[org.apache.spark.sql.Row] =
    MatView.recomputed(spark, root, d,
      AtomicPublish.currentTxn(spark, root).get).collect().toSet

  private def seed(root: String): Unit = {
    AtomicPublish.publish(spark, root, Map(
      "docs" -> docs(0 until 40, "en").unionByName(docs(40 until 60, "de"))
        .unionByName(docs(60 until 70, "fr")),
      "langs" -> langs("en" -> "germanic", "de" -> "germanic",
        "fr" -> "romance", "zh" -> "sinitic")))
    ()
  }

  test("join view: initialize, then appends on either side stay exact") {
    val root = freshRoot()
    seed(root)
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    assert(rows(root, "fam_stats") == expect(root, byFamily))
    // zh has no docs yet: inner join drops it from the view
    assert(!rows(root, "fam_stats").exists(_.getString(0) == "sinitic"))
    // append LEFT (new en docs + first zh docs)
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(70 until 90, "en")
        .unionByName(docs(90 until 95, "zh"))),
      parent = AtomicPublish.currentTxn(spark, root)).get
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    assert(rows(root, "fam_stats") == expect(root, byFamily))
    assert(rows(root, "fam_stats").exists(_.getString(0) == "sinitic"))
    // append RIGHT (a new lang family matching existing docs would need
    // new docs too — append an es row plus es docs in TWO commits, one
    // refresh over the interval exercises ΔA⋈ΔB cancellation)
    AtomicPublish.publishDelta(spark, root,
      append = Map("langs" -> langs("es" -> "romance")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(95 until 105, "es")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    assert(rows(root, "fam_stats") == expect(root, byFamily))
    // quiet store: refresh is a no-op, not an endless republish
    assert(MatView.refresh(spark, root, byFamily).isEmpty)
  }

  test("join delta terms never re-join history against history") {
    val root = freshRoot()
    seed(root)
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    val covered = MatView.watermark(spark, root, byFamily).get
    val v2 = AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(70 until 75, "fr")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    // the ΔA side of Δ(A⋈B) = ΔA⋈B_old + A_new⋈ΔB: its left input is
    // exactly the changesSince frame — only the delta commit's segment
    // backs it, never docs' v1 history
    val delta = AtomicPublish.changesSince(spark, root, "docs", covered,
      Some(v2)).get
    assert(delta.inputFiles.nonEmpty &&
      delta.inputFiles.forall(_.contains(s"v_$v2")))
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    assert(rows(root, "fam_stats") == expect(root, byFamily))
  }

  test("join view: deletes on either side signed-merge exactly") {
    val root = freshRoot()
    seed(root)
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    // delete LEFT rows (all fr docs → romance dies entirely)
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> (60L until 70L).toDF("doc_id")))
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    val afterLeft = rows(root, "fam_stats")
    assert(afterLeft == expect(root, byFamily))
    assert(!afterLeft.exists(_.getString(0) == "romance"))
    // delete RIGHT row (de): germanic loses the de docs AND a distinct
    // lang, but keeps en
    AtomicPublish.deleteRows(spark, root,
      Map("langs" -> Seq("de").toDF("lang")))
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    val afterRight = rows(root, "fam_stats")
    assert(afterRight == expect(root, byFamily))
    val germanic = afterRight.find(_.getString(0) == "germanic").get
    assert(germanic.getLong(1) == 40L && germanic.getLong(3) == 1L)
  }

  test("count_distinct un-merges by multiplicity, not presence") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" ->
      Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L))
        .toDF("doc_id", "lang", "words")))
    val d = MatView.Def("docs", "lang_card", Seq.empty,
      Seq(MatView.Agg("count", "doc_id", "n"),
        MatView.Agg("count_distinct", "lang", "n_langs")))
    assert(MatView.refresh(spark, root, d).isDefined)
    assert(rows(root, "lang_card") == expect(root, d))
    // delete ONE of the two en rows: n_langs must stay 2 (multiplicity
    // 2→1, still positive) — presence-only state would drop to 1
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(1L).toDF("doc_id")))
    assert(MatView.refresh(spark, root, d).isDefined)
    val afterOne = rows(root, "lang_card")
    assert(afterOne == expect(root, d))
    assert(afterOne.head.getLong(1) == 2L)
    // delete the LAST en row: now it drops
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(2L).toDF("doc_id")))
    assert(MatView.refresh(spark, root, d).isDefined)
    val afterTwo = rows(root, "lang_card")
    assert(afterTwo == expect(root, d))
    assert(afterTwo.head.getLong(1) == 1L)
    // kill the LAST row: a keyless view keeps its global row at zero,
    // exactly like the recompute's aggregate over an empty source
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(3L).toDF("doc_id")))
    assert(MatView.refresh(spark, root, d).isDefined)
    val dead = rows(root, "lang_card")
    assert(dead == expect(root, d))
    assert(dead.size == 1 && dead.head.getLong(0) == 0L &&
      dead.head.getLong(1) == 0L)
  }

  test("count_distinct: all-null column shows 0 like the recompute") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" ->
      Seq((1L, Option("en"), 10L), (2L, Option.empty[String], 20L),
        (3L, Option.empty[String], 30L)).toDF("doc_id", "lang", "words")))
    val d = MatView.Def("docs", "by_words", Seq("words"),
      Seq(MatView.Agg("count", "doc_id", "n"),
        MatView.Agg("count_distinct", "lang", "n_langs")))
    assert(MatView.refresh(spark, root, d).isDefined)
    assert(rows(root, "by_words") == expect(root, d))
    // null-lang groups exist with n_langs = 0, not null, not absent
    assert(rows(root, "by_words").count(_.getLong(2) == 0L) == 2)
    // incremental interval with more nulls and a delete stays exact
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> Seq((4L, Option.empty[String], 20L))
        .toDF("doc_id", "lang", "words")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(2L).toDF("doc_id")))
    assert(MatView.refresh(spark, root, d).isDefined)
    assert(rows(root, "by_words") == expect(root, d))
  }

  test("min/max join view: appends merge, a delete falls back, both exact") {
    val root = freshRoot()
    seed(root)
    val mm = MatView.JoinDef("docs", "langs", Seq("lang"), "fam_minmax",
      Seq("family"), Seq(MatView.Agg("min", "doc_id", "lo"),
        MatView.Agg("max", "doc_id", "hi")))
    assert(MatView.refresh(spark, root, mm).isDefined)
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(70 until 80, "fr")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    assert(MatView.refresh(spark, root, mm).isDefined)
    assert(rows(root, "fam_minmax") == expect(root, mm))
    // a delete cannot be un-merged from min/max: the fallback recompute
    // must still land the exact answer (the max of romance moves DOWN)
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> (75L until 80L).toDF("doc_id")))
    assert(MatView.refresh(spark, root, mm).isDefined)
    assert(rows(root, "fam_minmax") == expect(root, mm))
    assert(rows(root, "fam_minmax")
      .find(_.getString(0) == "romance").get.getLong(2) == 74L)
  }

  test("replace (compaction) of either join side triggers the recompute") {
    val root = freshRoot()
    seed(root)
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(70 until 75, "de")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    Compaction.compactStore(spark, root, "docs")
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    assert(rows(root, "fam_stats") == expect(root, byFamily))
    // and the RIGHT side: replace langs wholesale (re-crawl shape)
    AtomicPublish.publishDelta(spark, root, append = Map.empty,
      replace = Map("langs" -> langs("en" -> "germanic", "de" -> "germanic",
        "fr" -> "romance", "zh" -> "sinitic", "pt" -> "romance")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    assert(rows(root, "fam_stats") == expect(root, byFamily))
  }

  test("view, aux, distinct state and watermark commit atomically") {
    val root = freshRoot()
    seed(root)
    val rtxn = MatView.refresh(spark, root, byFamily).get
    val manifest = AtomicPublish.manifestOf(spark, root, rtxn)
    Seq("fam_stats", byFamily.auxTable, byFamily.wmTable,
      byFamily.dvTable(byFamily.distinctAggs.head)).foreach { t =>
      assert(manifest(t) == Seq(rtxn), s"$t not owned by the refresh txn")
    }
    // ambiguous non-join shared columns are rejected up front
    AtomicPublish.publishDelta(spark, root,
      append = Map.empty,
      replace = Map("langs2" -> Seq(("en", "x", 1L))
        .toDF("lang", "family", "words")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    val bad = MatView.JoinDef("docs", "langs2", Seq("lang"), "bad_view",
      Seq("family"), Seq(MatView.Agg("count", "doc_id", "n")))
    val e = intercept[IllegalArgumentException] {
      MatView.refresh(spark, root, bad)
    }
    assert(e.getMessage.contains("non-join columns"))
  }

  test("mixed interval on a join view with distinct aggs stays exact") {
    val root = freshRoot()
    seed(root)
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    // one interval: append docs (en, zh), append a lang (es), delete
    // docs (some en, all fr), delete a lang (de), append es docs —
    // every delta term of the signed identity is non-empty
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(70 until 80, "en")
        .unionByName(docs(80 until 85, "zh"))),
      parent = AtomicPublish.currentTxn(spark, root)).get
    AtomicPublish.publishDelta(spark, root,
      append = Map("langs" -> langs("es" -> "romance")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> ((0L until 20L) ++ (60L until 70L)).toDF("doc_id")))
    AtomicPublish.deleteRows(spark, root,
      Map("langs" -> Seq("de").toDF("lang")))
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(85 until 95, "es")),
      parent = AtomicPublish.currentTxn(spark, root)).get
    assert(MatView.refresh(spark, root, byFamily).isDefined)
    assert(rows(root, "fam_stats") == expect(root, byFamily))
    assert(MatView.refresh(spark, root, byFamily).isEmpty)
  }
}
