package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PREDICATE-SCOPED OVERWRITE ([[AtomicPublish.overwriteWhere]] —
  * Delta's `replaceWhere` / the `INSERT OVERWRITE` backfill): replace
  * exactly the rows matching a predicate in one atomic commit, at
  * O(segments that can hold matching rows) — non-admitting owners are
  * carried by reference, byte-identical. The re-statement operation
  * ("yesterday's partition was wrong") of a 100 TB ingest table. */
class OverwriteWhereSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("replace-where").resolve("store").toString

  private def docs(ids: Range, tag: String = "a"): DataFrame =
    ids.map(i => (i.toLong, tag, i * 10L)).toDF("id", "tag", "v")

  /** (path, mtime) of every data file of `owner`'s segment. */
  private def fileSig(root: String, owner: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$root/v_$owner/docs"))
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(f => f.getPath -> f.lastModified()).toSet
  }

  private def stage3(root: String): Seq[String] = {
    AtomicPublish.publish(spark, root,
      Map("docs" -> docs(0 until 10).repartition(1)),
      statsBy = Map("docs" -> Seq("id")))
    (1 to 2).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> docs(k * 10 until (k + 1) * 10)
          .repartition(1)),
        parent = AtomicPublish.currentTxn(spark, root))
    }
    AtomicPublish.currentManifestMeta(spark, root).get._2("docs").owners
  }

  test("replace one id range: admitted owner rewritten, the other two " +
      "carried BYTE-IDENTICAL, values exact") {
    val root = freshRoot()
    val owners = stage3(root)
    val sigs = owners.map(o => o -> fileSig(root, o)).toMap
    // correct the middle segment's range: ids 10..19 get tag "fixed",
    // and id 15 is dropped (the corrected day has fewer rows)
    val corrected = docs(10 until 20, tag = "fixed")
      .filter(col("id") =!= 15L)
    val txn = AtomicPublish.overwriteWhere(spark, root, "docs",
      corrected, "id >= 10 AND id < 20")
    val m = AtomicPublish.manifestMetaOf(spark, root, txn)("docs")
    // owners 0 and 2 carried by reference — same files, same mtimes
    assert(m.owners.take(1) == owners.take(1) &&
      m.owners(1) == owners(2), m.owners)
    assert(fileSig(root, owners.head) == sigs(owners.head))
    assert(fileSig(root, owners(2)) == sigs(owners(2)))
    val got = AtomicPublish.readTable(spark, root, "docs")
    assert(got.count() == 29)
    assert(got.filter(col("id") >= 10 && col("id") < 20)
      .select("tag").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("fixed"))
    assert(got.filter(col("id") === 15L).count() == 0)
    assert(got.filter(col("tag") === "a").count() == 20)
  }

  test("SQL semantics: a row where the predicate evaluates NULL is " +
      "KEPT, not replaced") {
    val root = freshRoot()
    val withNull = Seq((1L, "a", Some(5L)), (2L, "a", None),
      (3L, "a", Some(50L))).toDF("id", "tag", "v")
    AtomicPublish.publish(spark, root, Map("docs" -> withNull))
    AtomicPublish.overwriteWhere(spark, root, "docs",
      Seq((30L, "fixed", 99L)).toDF("id", "tag", "v"), "v > 10")
    val got = AtomicPublish.readTable(spark, root, "docs")
      .collect().map(r => r.getLong(0)).toSet
    // id=3 (v=50) replaced away; id=2 (v NULL → predicate NULL) kept
    assert(got == Set(1L, 2L, 30L), got)
  }

  test("containment: a replacement row OUTSIDE the predicate refuses " +
      "the whole commit atomically — even when a join would discard it") {
    val root = freshRoot()
    stage3(root)
    val before = AtomicPublish.currentTxn(spark, root)
    val e = intercept[IllegalArgumentException] {
      AtomicPublish.overwriteWhere(spark, root, "docs",
        docs(10 until 25, tag = "leak"), "id >= 10 AND id < 20")
    }
    assert(e.getMessage.contains("GRAFT_OVERWRITE_OUTSIDE_PREDICATE"))
    assert(AtomicPublish.currentTxn(spark, root) == before, "partial state")
    assert(AtomicPublish.readTable(spark, root, "docs").count() == 30)
  }

  test("no admitting segment: the overwrite is a pure append") {
    val root = freshRoot()
    val owners = stage3(root)
    val sigs = owners.map(o => o -> fileSig(root, o)).toMap
    AtomicPublish.overwriteWhere(spark, root, "docs",
      docs(100 until 105, tag = "new"), "id >= 100")
    val m = AtomicPublish.currentManifestMeta(spark, root).get._2("docs")
    assert(m.owners.take(3) == owners, "append must keep the full chain")
    owners.foreach(o => assert(fileSig(root, o) == sigs(o)))
    assert(AtomicPublish.readTable(spark, root, "docs").count() == 35)
  }

  test("a TOMBSTONED table takes the copy-on-write path: result exact, " +
      "tombstone debt consumed") {
    val root = freshRoot()
    stage3(root)
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(5L, 25L).toDF("id")))
    AtomicPublish.overwriteWhere(spark, root, "docs",
      docs(10 until 20, tag = "fixed"), "id >= 10 AND id < 20")
    val metas = AtomicPublish.currentManifestMeta(spark, root).get._2
    assert(!metas.get("docs__del").exists(_.owners.nonEmpty),
      "COW overwrite must consume the tombstone debt")
    val got = AtomicPublish.readTable(spark, root, "docs")
    assert(got.count() == 28) // 30 - 2 deleted, range re-stated whole
    assert(got.filter(col("id").isin(5L, 25L)).count() == 0,
      "COW fallback resurrected deleted rows")
    assert(got.filter(col("tag") === "fixed").count() == 10)
  }

  test("SQL face: df.writeTo(t).overwrite(cond) routes the scoped " +
      "path; INSERT OVERWRITE (no partition filter) is a full replace") {
    val root = freshRoot()
    val cat = "owcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val owners = stage3(root)
    val sigs = owners.map(o => o -> fileSig(root, o)).toMap
    docs(10 until 20, tag = "fixed").writeTo(s"$cat.docs")
      .overwrite(col("id") >= 10L && col("id") < 20L)
    // scoped: the untouched owners survive by reference
    assert(fileSig(root, owners.head) == sigs(owners.head))
    assert(fileSig(root, owners(2)) == sigs(owners(2)))
    val got = spark.table(s"$cat.docs")
    assert(got.count() == 30)
    assert(got.filter(col("tag") === "fixed").count() == 10)
    // a full INSERT OVERWRITE replaces the table
    spark.sql(s"INSERT OVERWRITE $cat.docs " +
      "SELECT id, tag, v FROM VALUES (900L, 'all', 1L) AS t(id, tag, v)")
    assert(spark.table(s"$cat.docs").count() == 1)
  }

  test("CHECK constraints are enforced on the replacement rows of the " +
      "SUBSET path (replaceOwners stages directly — no free pass)") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root,
      Map("docs" -> docs(0 until 10).repartition(1)),
      statsBy = Map("docs" -> Seq("id")),
      checks = Map("docs" -> Map("pos_v" -> "v >= 0")))
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(10 until 20).repartition(1)),
      parent = AtomicPublish.currentTxn(spark, root))
    val before = AtomicPublish.currentTxn(spark, root)
    // replacement inside the predicate but violating the table's CHECK
    val bad = Seq((12L, "fixed", -5L)).toDF("id", "tag", "v")
    val e = intercept[IllegalArgumentException] {
      AtomicPublish.overwriteWhere(spark, root, "docs", bad,
        "id >= 10 AND id < 20")
    }
    assert(e.getMessage.contains(AtomicPublish.CheckViolation) &&
      e.getMessage.contains("pos_v"), e.getMessage)
    assert(AtomicPublish.currentTxn(spark, root) == before, "partial state")
    // a clean replacement passes and keeps the rules recorded
    AtomicPublish.overwriteWhere(spark, root, "docs",
      Seq((12L, "fixed", 5L)).toDF("id", "tag", "v"),
      "id >= 10 AND id < 20")
    val m = AtomicPublish.currentManifestMeta(spark, root).get._2("docs")
    assert(m.checks == Map("pos_v" -> "v >= 0"))
    assert(AtomicPublish.readTable(spark, root, "docs").count() == 11)
  }

  test("classic syntax: INSERT OVERWRITE t PARTITION (c = v) on an " +
      "identity-partitioned table replaces exactly that partition") {
    val root = freshRoot()
    val cat = "owpcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val cells = (0 until 30).map(i => (i.toLong, s"p$i", i % 3))
      .toDF("id", "payload", "cell")
    AtomicPublish.publish(spark, root, Map("cells" -> cells),
      partitionBy = Map("cells" -> Seq("cell")))
    spark.sql(s"INSERT OVERWRITE $cat.cells PARTITION (cell = 1) " +
      "SELECT id, payload FROM VALUES (100L, 'fresh'), (101L, 'fresh') " +
      "AS t(id, payload)")
    val got = spark.table(s"$cat.cells")
    assert(got.count() == 22, "two partitions kept + two fresh rows")
    assert(got.filter(col("cell") === 1).count() == 2)
    assert(got.filter(col("cell") === 1 && col("payload") === "fresh")
      .count() == 2)
    assert(got.filter(col("cell") =!= 1).count() == 20, "other cells lost")
  }
}
