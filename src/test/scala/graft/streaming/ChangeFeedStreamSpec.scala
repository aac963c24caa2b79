package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException, Trigger}

import graft.SparkSuite
import graft.ops.{AtomicPublish, Compaction, MatView}

/** The store's streaming change feed (`readStream.format("graft")`):
  * one microbatch per commit interval carrying exactly the appended
  * rows, checkpoint-exact restarts, replace detection with the
  * documented full-resync fallback, and the continuously-maintained
  * MatView it exists for. */
class ChangeFeedStreamSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("cfeed").resolve("store").toString

  private def slice(ids: Range, lang: String): DataFrame =
    ids.map(i => (i.toLong, lang, i * 10L)).toDF("doc_id", "lang", "words")

  private def startFeed(root: String, checkpoint: String)(
      onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream.format("graft")
      .option("root", root).option("table", "docs").load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(onBatch)
      .start()

  private def drain(q: StreamingQuery): Unit = {
    q.awaitTermination(); ()
  }

  test("one microbatch per commit interval; restart resumes exactly") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("cfeed-ck").toString
    AtomicPublish.publish(spark, root, Map("docs" -> slice(0 until 10, "en")))
    val seen = mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def run(): Unit = drain(startFeed(root, ckpt) { (df, id) =>
      seen += id -> df.select("doc_id").collect().map(_.getLong(0)).toSet
      ()
    })
    // batch 0 of a fresh checkpoint: the full current snapshot
    run()
    assert(seen.map(_._2) == Seq((0L until 10L).toSet))
    // three commits while the stream is DOWN, then restart on the SAME
    // checkpoint: the missed segments arrive (no re-delivery of batch 0)
    (1 to 3).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> slice(k * 10 until (k + 1) * 10, "en")),
        parent = AtomicPublish.currentTxn(spark, root))
    }
    seen.clear()
    run()
    assert(seen.flatMap(_._2).toSet == (10L until 40L).toSet)
    assert(seen.forall(_._2.nonEmpty))
    // a DELETE commit adds tombstones, not owners: the append feed
    // stays quiet (delete-aware consumers use changesWithDeletes)
    AtomicPublish.deleteRows(spark, root,
      Map("docs" -> Seq(5L).toDF("doc_id")))
    seen.clear()
    run()
    assert(seen.flatMap(_._2).isEmpty)
  }

  test("streaming matview: commits drive refreshes; compaction falls back") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("cfeed-mv-ck").toString
    val d = MatView.Def("docs", "lang_counts", Seq("lang"),
      Seq(MatView.Agg("count", "doc_id", "n"),
        MatView.Agg("sum", "words", "w")))
    AtomicPublish.publish(spark, root, Map("docs" -> slice(0 until 20, "en")))
    def expect(): Set[Row] = MatView.recomputed(spark, root, d,
      AtomicPublish.currentTxn(spark, root).get).collect().toSet
    def view(): Set[Row] = AtomicPublish.readTable(spark, root, "lang_counts")
      .collect().toSet
    def run(ck: String): Unit = drain(MatView.streamRefresh(
      spark, root, d, ck, Trigger.AvailableNow()))
    // three commits → three intervals → the view tracks each
    run(ckpt)
    (1 to 2).foreach { k =>
      AtomicPublish.publishDelta(spark, root,
        append = Map("docs" -> slice(20 + k * 5 until 25 + k * 5, "de")),
        parent = AtomicPublish.currentTxn(spark, root))
      run(ckpt)
    }
    assert(view() == expect())
    // equivalence with a plain batch refresh (already current → no-op)
    assert(MatView.refresh(spark, root, d).isEmpty)
    // COMPACTION mid-stream rewrites the owner chain: the next drain
    // fails with the documented resync signal…
    Compaction.compactStore(spark, root, "docs")
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> slice(100 until 105, "fr")),
      parent = AtomicPublish.currentTxn(spark, root))
    val e = intercept[StreamingQueryException] {
      drain(startFeed(root, ckpt) { (_, _) => () })
    }
    assert(e.getMessage.contains(GraftChangeFeedSource.ResyncRequired) ||
      Option(e.getCause).exists(
        _.getMessage.contains(GraftChangeFeedSource.ResyncRequired)))
    // …the fallback is a batch refresh (handles the replace by full
    // recompute) plus a FRESH checkpoint, whose first batch re-delivers
    // the snapshot and the feed continues
    assert(MatView.refresh(spark, root, d).isDefined)
    assert(view() == expect())
    val ckpt2 = Files.createTempDirectory("cfeed-mv-ck2").toString
    run(ckpt2)
    AtomicPublish.publishDelta(spark, root,
      append = Map("docs" -> slice(200 until 203, "es")),
      parent = AtomicPublish.currentTxn(spark, root))
    run(ckpt2)
    assert(view() == expect())
  }
}
