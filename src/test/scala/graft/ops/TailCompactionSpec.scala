package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Minor (tail) compaction ([[Compaction.compactTail]]): the O(tail)
  * maintenance move — the owner chain's small SUFFIX merges into one
  * segment while the consolidated head is carried by reference, its
  * files untouched on disk. The 100 TB claim in testable form: the
  * head's data files must be byte-identical (same paths, same
  * modification times) across the operation. */
class TailCompactionSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("tailcomp").resolve("store").toString

  private def docs(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"text-$i", i * 10L)).toDF("doc_id", "text", "w")

  /** (path → mtime) of every data file in an owner segment. */
  private def segFiles(root: String, owner: String,
      table: String = "docs"): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$root/v_$owner/$table"))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getPath -> f.lastModified).toMap
  }

  private def owners(root: String): Seq[String] =
    AtomicPublish.currentManifestMeta(spark, root).get._2("docs").owners

  test("the small suffix merges; the head is carried by reference " +
      "(same files, same mtimes); reads stay exact") {
    val root = freshRoot()
    // a consolidated 'head' segment plus 5 small appends
    AtomicPublish.publish(spark, root, Map("docs" -> docs(0 until 2000)),
      statsBy = Map("docs" -> Seq("doc_id")))
    val head = owners(root).head
    (0 until 5).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> docs(2000 + k * 100 until 2100 + k * 100)),
        parent = AtomicPublish.currentTxn(spark, root))
    }
    val headBefore = segFiles(root, head)
    assert(owners(root).size == 6)
    // target sized so the 2000-row head counts as "big" and the
    // 100-row appends as "small" — the leveled-compaction shape
    val Some((txn, _)) = Compaction.compactTail(spark, root, "docs",
      targetBytes = 10 * 1024)
    assert(AtomicPublish.currentTxn(spark, root).contains(txn))
    // owner chain: untouched head + ONE merged tail
    assert(owners(root) == Seq(head, txn))
    assert(segFiles(root, head) == headBefore,
      "head files were rewritten — minor compaction must be O(tail)")
    // data exact
    assert(AtomicPublish.readTable(spark, root, "docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      (0L until 2500L).toSet)
    // zone maps: the head's segment stats survive, the tail's are fresh
    val meta = AtomicPublish.manifestMetaOf(spark, root, txn)("docs")
    assert(meta.segStats.keySet == Set(head, txn))
  }

  test("nothing worth doing → None, no commit: too few small segments; " +
      "tombstones route to the full path") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" -> docs(0 until 100)))
    val before = AtomicPublish.currentTxn(spark, root)
    assert(Compaction.compactTail(spark, root, "docs").isEmpty)
    assert(AtomicPublish.currentTxn(spark, root) == before)
    // add small appends + a delete: tombstoned tables refuse the
    // suffix renumbering
    (0 until 3).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> docs(100 + k * 10 until 110 + k * 10)),
        parent = AtomicPublish.currentTxn(spark, root))
    }
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(5L).toDF("doc_id")))
    assert(Compaction.compactTail(spark, root, "docs").isEmpty)
    // the full path still works and applies the tombstone
    Compaction.compactStore(spark, root, "docs")
    assert(AtomicPublish.readTable(spark, root, "docs").count() == 129)
  }

  test("bucketed table: the merged tail re-buckets, the co-location " +
      "invariant holds across every segment") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" -> docs(0 until 5000)),
      bucketBy = Map("docs" -> (Seq("doc_id"), 4)))
    (0 until 4).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> docs(5000 + k * 50 until 5050 + k * 50)),
        parent = AtomicPublish.currentTxn(spark, root))
    }
    assert(Compaction.compactTail(spark, root, "docs",
      targetBytes = 10 * 1024).isDefined)
    val m = AtomicPublish.currentManifestMeta(spark, root).get._2("docs")
    assert(m.numBuckets == 4 && m.owners.size == 2)
    // every file of every surviving owner still carries a bucket id
    m.owners.foreach { o =>
      segFiles(root, o).keys.foreach { p =>
        val name = new java.io.File(p).getName
        assert(org.apache.spark.sql.execution.datasources.BucketingUtils
          .getBucketId(name).isDefined, s"unbucketed file $name")
      }
    }
    assert(AtomicPublish.readTable(spark, root, "docs").count() == 5200)
  }

  test("repeated small appends: auto-compaction now runs the minor " +
      "path — the first segment is never rewritten") {
    val root = freshRoot()
    AtomicPublish.publish(spark, root, Map("docs" -> docs(0 until 5000)))
    val head = owners(root).head
    val headBefore = segFiles(root, head)
    (0 until 12).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> docs(5000 + k * 10 until 5010 + k * 10)),
        parent = AtomicPublish.currentTxn(spark, root))
      Compaction.autoCompact(spark, root,
        AtomicPublish.currentTxn(spark, root).get,
        maxOwners = 4, targetFileBytes = 10 * 1024)
    }
    assert(owners(root).size <= 5)
    assert(owners(root).head == head)
    assert(segFiles(root, head) == headBefore,
      "auto-compaction rewrote the consolidated head")
    assert(AtomicPublish.readTable(spark, root, "docs").count() == 5120)
  }
}
