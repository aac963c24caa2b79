package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** SQL schema/name evolution beyond ADD COLUMNS: `ALTER TABLE … RENAME
  * TO` (O(1) metadata via the per-owner dir mapping — no data moves),
  * and `RENAME COLUMN`/`DROP COLUMN` (copy-on-write rewrites that
  * carry the declared layout along and refuse when the column anchors
  * delete history or a CHECK constraint). History stays
  * time-travelable to the old shape in every case. */
class SchemaEvolutionSpec extends SparkSuite {
  import spark.implicits._

  private var n = 0
  private def mount(root: String): String = {
    n += 1
    val name = s"graftevo$n"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  private def freshRoot(): String =
    Files.createTempDirectory("schevo").resolve("store").toString

  private def docs(ids: Range, lang: String = "en"): DataFrame =
    ids.map(i => (i.toLong, lang, i * 10L)).toDF("doc_id", "lang", "words")

  test("ALTER TABLE RENAME TO: O(1), no data staged, reads identical, " +
      "tombstones and time travel intact") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" -> docs(0 until 100)),
      statsBy = Map("docs" -> Seq("doc_id")))
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> docs(100 until 150, "de")),
      parent = AtomicPublish.currentTxn(spark, root))
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(5L).toDF("doc_id")))
    val preRename = AtomicPublish.currentTxn(spark, root).get
    val cat = mount(root)
    spark.sql(s"ALTER TABLE $cat.docs RENAME TO corpus")
    val txn = AtomicPublish.currentTxn(spark, root).get
    // no data staged in the rename commit
    assert(new java.io.File(s"$root/v_$txn").listFiles
      .forall(f => !f.isDirectory))
    // reads under the new name, delete-aware; the old name is gone
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus")
      .head().getLong(0) == 149)
    assert(!spark.catalog.tableExists(s"$cat.docs"))
    // the companion rode along: a fresh delete still works on the key
    spark.sql(s"DELETE FROM $cat.corpus WHERE doc_id = 7")
    assert(spark.sql(s"SELECT count(*) FROM $cat.corpus")
      .head().getLong(0) == 148)
    // pre-rename version time-travels under the OLD name
    assert(spark.sql(s"SELECT count(*) FROM $cat.docs " +
      s"VERSION AS OF '$preRename'").head().getLong(0) == 149)
  }

  test("RENAME COLUMN: copy-on-write rewrite, layout follows, history " +
      "keeps the old shape") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" -> docs(0 until 100)),
      statsBy = Map("docs" -> Seq("words")),
      bucketBy = Map("docs" -> (Seq("doc_id"), 4)))
    val pre = AtomicPublish.currentTxn(spark, root).get
    val cat = mount(root)
    spark.sql(s"ALTER TABLE $cat.docs RENAME COLUMN words TO n_words")
    val meta = AtomicPublish.currentManifestMeta(spark, root).get._2("docs")
    assert(meta.schema.get.fieldNames.toSeq ==
      Seq("doc_id", "lang", "n_words"))
    assert(meta.statCols == Seq("n_words"), "stat layout did not follow")
    assert(meta.numBuckets == 4 && meta.bucketCols == Seq("doc_id"))
    assert(spark.sql(s"SELECT sum(n_words) FROM $cat.docs")
      .head().getLong(0) == (0 until 100).map(_ * 10L).sum)
    // time travel serves the OLD column name
    assert(spark.sql(s"SELECT sum(words) FROM $cat.docs " +
      s"VERSION AS OF '$pre'").head().getLong(0) ==
      (0 until 100).map(_ * 10L).sum)
  }

  test("DROP COLUMN: rewrite without the column; guards refuse the " +
      "delete key, checked columns and layout columns") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" -> docs(0 until 50)),
      statsBy = Map("docs" -> Seq("doc_id")),
      checks = Map("docs" -> Map("pos" -> "words >= 0")))
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(3L).toDF("doc_id")))
    val cat = mount(root)
    // the delete key is anchored
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.docs DROP COLUMN doc_id")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e1).contains("delete key") || msgs(e1).contains("layout"))
    // a checked column is anchored until the check drops
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.docs DROP COLUMN words")
    }
    assert(msgs(e2).contains("check"))
    spark.sql(s"CALL $cat.system.drop_check(table => 'docs', " +
      "name => 'pos')").collect()
    spark.sql(s"ALTER TABLE $cat.docs DROP COLUMN words")
    val meta = AtomicPublish.currentManifestMeta(spark, root).get._2("docs")
    assert(meta.schema.get.fieldNames.toSeq == Seq("doc_id", "lang"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.docs")
      .head().getLong(0) == 49) // the rewrite consumed the tombstone
    // RENAME of the delete key is refused too
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.docs RENAME COLUMN doc_id TO id")
    }
    assert(msgs(e3).contains("delete key"))
  }
}
