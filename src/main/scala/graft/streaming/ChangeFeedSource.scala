package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.types.StructType

import graft.ops.AtomicPublish

/** STREAMING FACE OF THE STORE'S CHANGE FEED: a microbatch
  * `readStream` source over [[AtomicPublish.changesSince]]'s
  * owner-segment model, so a downstream consumer (a continuously
  * maintained MatView, a sync job) subscribes to commits instead of
  * scheduling its own polling loop. Mounted through the same
  * `format("graft")` face as batch reads:
  *
  * {{{
  * spark.readStream.format("graft")
  *   .option("root", storeRoot).option("table", "docs").load()
  * }}}
  *
  * Offsets are (owner-count, last-owner-id) pairs over the table's
  * APPEND-ONLY owner chain: each microbatch reads exactly the segments
  * committed in its interval via [[AtomicPublish.readTableSegments]] —
  * a plain pruned batch read, so the microbatch plan keeps the store's
  * whole scan stack (recorded schema, one relation, skipping layers on
  * any further filter). The first batch of a fresh checkpoint is the
  * full current snapshot (offset `None` → everything), which IS the
  * resync semantics a restarted consumer needs.
  *
  * REPLACE-AWARE: a compaction/upsert rewrites the owner chain, and a
  * segment-offset feed cannot diff across a rewrite (same reason
  * [[AtomicPublish.changesSince]] returns None). Both offsets carry
  * the id of the last owner they cover, and [[getBatch]] verifies the
  * chain still has that id at that position — a mismatch fails the
  * stream with [[GraftChangeFeedSource.ResyncRequired]] naming the
  * fallback: refresh downstream state from a batch read and restart
  * from a fresh checkpoint. Deletes ([[AtomicPublish.deleteRows]]) add
  * tombstones, not owners: they do not advance this feed (its contract
  * is the APPENDED rows, like a log's); delete-aware consumers use the
  * batch CDC feed [[AtomicPublish.changesWithDeletes]] per interval.
  *
  * Retention contract: vacuum must keep every version a lagging
  * consumer's next offset still references (the standard
  * log-compaction/consumer-lag tradeoff).
  */
final class GraftChangeFeedSource(spark: SparkSession, root: String,
    table: String) extends Source {

  import GraftChangeFeedSource._

  override val schema: StructType = {
    val (txn, metas) = AtomicPublish.currentManifestMeta(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no published version under $root"))
    val meta = metas.getOrElse(table, throw new IllegalArgumentException(
      s"table '$table' is not in version $txn under $root"))
    meta.schema.getOrElse(
      AtomicPublish.readTableSegments(spark, root, table, txn,
        meta.owners).schema)
  }

  private def owners(): (String, Seq[String]) = {
    val (txn, metas) = AtomicPublish.currentManifestMeta(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no published version under $root"))
    txn -> metas.get(table).map(_.owners).getOrElse(Nil)
  }

  override def getOffset: Option[Offset] = {
    val (_, os) = owners()
    if (os.isEmpty) None else Some(ChainOffset(os.size, os.last))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (txn, os) = owners()
    val endO = ChainOffset.of(end)
    val startN = start.map(ChainOffset.of) match {
      case None => 0
      case Some(s) =>
        require(s.n <= os.size && os(s.n - 1) == s.last,
          resyncMessage(table, s"segment ${s.n} is no longer '${s.last}'"))
        s.n
    }
    require(endO.n <= os.size && os(endO.n - 1) == endO.last,
      resyncMessage(table, s"segment ${endO.n} is no longer '${endO.last}'"))
    org.apache.spark.sql.graftstream.StreamingBridge.asStreaming(
      AtomicPublish.readTableSegments(spark, root, table, txn,
        os.slice(startN, endO.n)),
      this)
  }

  override def stop(): Unit = ()
}

object GraftChangeFeedSource {

  /** Thrown (inside the StreamingQueryException) when the owner chain
    * was rewritten under a running stream. */
  val ResyncRequired = "GRAFT_RESYNC_REQUIRED"

  private def resyncMessage(table: String, what: String): String =
    s"$ResyncRequired: the owner chain of table '$table' was rewritten " +
      s"under this stream ($what) — a compaction/upsert replaced " +
      "segments, and a segment-offset feed cannot diff across a " +
      "rewrite. Fall back: bring downstream state current with a batch " +
      "read (e.g. MatView.refresh, which recomputes over a replace), " +
      "then restart the stream from a FRESH checkpoint (its first " +
      "batch re-delivers the full current snapshot)."

  /** Offset over the append-only owner chain: `n` segments consumed,
    * the last of which is `last` — the id pins the prefix so a rewrite
    * is detected, not silently misread. */
  final case class ChainOffset(n: Int, last: String) extends Offset {
    override def json(): String =
      s"""{"n":$n,"last":"$last"}"""
  }

  object ChainOffset {
    private val Re = """\{"n":(\d+),"last":"([^"]*)"\}""".r
    def of(o: org.apache.spark.sql.connector.read.streaming.Offset)
        : ChainOffset = o match {
      case c: ChainOffset => c
      case s: SerializedOffset => parse(s.json)
      case other => parse(other.json())
    }
    def parse(json: String): ChainOffset = json match {
      case Re(n, last) => ChainOffset(n.toInt, last)
      case _ => throw new IllegalArgumentException(
        s"not a graft change-feed offset: $json")
    }
  }
}
