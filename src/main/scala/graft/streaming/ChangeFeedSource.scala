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
    table: String, fromLatest: Boolean = false,
    /** BACKLOG ADMISSION CONTROL (`option("maxOwnersPerTrigger", n)`
      * — Kafka's `maxOffsetsPerTrigger` / Delta's `maxFilesPerTrigger`
      * shape): cap each microbatch at `n` owner segments, so a fresh
      * checkpoint over a deep ingest history (1000 commits of
      * micro-batch appends) drains as a paced sequence of bounded
      * batches instead of one giant snapshot read — at 100 TB the
      * difference between a stream that starts and one that OOMs its
      * first trigger. None = unbounded (the prior behavior). */
    maxOwnersPerTrigger: Option[Int] = None) extends Source {

  import GraftChangeFeedSource._

  maxOwnersPerTrigger.foreach(m => require(m >= 1,
    s"maxOwnersPerTrigger must be >= 1, got $m"))

  /** The chain position this source has ADMITTED through (V1 sources
    * rate-limit by remembering their last returned offset — the Kafka
    * V1 pattern). Seeded by [[getBatch]] on a checkpoint restart: the
    * engine replays the recovered interval through getBatch before it
    * ever calls getOffset, so the tracker resumes from the checkpoint,
    * never behind it. */
  @volatile private var admittedN: Option[Int] = None

  // `startingOffsets=latest` contract: batch 0 (start = None) delivers
  // NOTHING — the stream begins AT its first observed offset, and
  // later batches carry only go-forward commits (the Kafka `latest`
  // shape: a metrics tap, an alerting feed — consumers whose state
  // does not need the backlog). Batch 0 must be a pure function of
  // (None, end): a checkpoint restart REPLAYS it with start = None, so
  // any state captured at (re)construction time would make the replay
  // diverge from the original run. "Empty" is the one latest-start
  // batch 0 that replays identically.

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
    if (os.isEmpty) return None
    val n = maxOwnersPerTrigger match {
      case None => os.size
      case Some(m) =>
        // from == os.size (caught up) returns the unchanged end offset
        // and the engine plans no batch
        val from = admittedN.getOrElse(if (fromLatest) os.size else 0)
        math.min(from + m, os.size)
    }
    admittedN = Some(n)
    if (n == 0) None else Some(ChainOffset(n, os(n - 1)))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (txn, os) = owners()
    val endO = ChainOffset.of(end)
    // seed/advance the admission tracker — on restart the engine
    // replays the checkpointed interval through here first
    admittedN = Some(math.max(admittedN.getOrElse(0), endO.n))
    val startN = start.map(ChainOffset.of) match {
      case None => if (fromLatest) endO.n else 0
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

/** STREAMING CDC FACE: `readStream.format("graft")` with
  * `option("withDeletes", "true")` — each microbatch carries the rows
  * the table GAINED and the rows it LOST in the commit interval as
  * SIGNED rows (`_change_type` ∈ insert|delete), computed by the batch
  * CDC feed [[AtomicPublish.changesWithDeletes]] — so DELETES advance
  * the stream and a stream-maintained downstream mirror stays exact,
  * where the plain change feed (appends only) would silently retain
  * deleted rows.
  *
  * Offsets are COMMIT TXN IDS (not owner positions): published
  * versions are immutable, so `getBatch(start, end)` is replay-
  * deterministic, and the interval diff inherits every exactness
  * property of the batch feed (asof scoping, skipping-layer-pruned
  * delete reads). The first batch of a fresh checkpoint is the full
  * snapshot at the pinned txn, all `insert` — the resync semantics.
  * A rewrite in the interval (compaction/upsert), or a `start` version
  * already vacuumed, fails the stream with
  * [[GraftChangeFeedSource.ResyncRequired]] BEFORE emitting anything —
  * never a partial batch.
  *
  * Consumer-lag registry: after resolving each batch the source
  * records its end txn under `_consumers/<checkpoint-id>` at the store
  * root — [[AtomicPublish.vacuum]] protects every registered version
  * (and its reference closure) younger than its consumer TTL, so a
  * LAGGING stream's next `sinceTxn` manifest survives retention
  * instead of being reclaimed under the stream. */
final class GraftCdcFeedSource(spark: SparkSession, root: String,
    table: String, consumerId: String, fromLatest: Boolean = false,
    /** `option("updateImages", "true")` — Delta CDF's four-valued
      * `_change_type` vocabulary: within each commit interval, a
      * delete and an insert sharing the table's recorded delete-key
      * tuple classify as `update_preimage` / `update_postimage`
      * instead of plain delete/insert — so a MERGE's updated rows
      * arrive as updates, the way a downstream auditor or
      * slowly-changing-dimension sync wants them. Keys with a NULL
      * component keep the plain tags (the classification join is
      * equi, like SQL's); a table that never recorded a delete key
      * has nothing to classify by and streams the two-valued feed. */
    updateImages: Boolean = false)
  extends Source {

  import GraftChangeFeedSource._

  // `startingOffsets=latest`: batch 0 is EMPTY instead of the
  // full-snapshot resync batch — see the replay-determinism note on
  // [[GraftChangeFeedSource]] (batch 0 must be a pure function of
  // (None, end); the stream then carries only post-start commits).

  private val baseSchema: StructType = {
    val (txn, metas) = AtomicPublish.currentManifestMeta(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no published version under $root"))
    val meta = metas.getOrElse(table, throw new IllegalArgumentException(
      s"table '$table' is not in version $txn under $root"))
    meta.schema.getOrElse(
      AtomicPublish.readTableSegments(spark, root, table, txn,
        meta.owners).schema)
  }

  override val schema: StructType =
    baseSchema.add(ChangeTypeCol, org.apache.spark.sql.types.StringType)

  override def getOffset: Option[Offset] =
    AtomicPublish.currentTxn(spark, root).map(TxnOffset.apply)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val endTxn = TxnOffset.of(end).txn
    val batch = start.map(TxnOffset.of) match {
      case None if fromLatest =>
        AtomicPublish.readTableAt(spark, root, table, endTxn).limit(0)
          .withColumn(ChangeTypeCol, lit("insert"))
      case None =>
        // fresh checkpoint: the full snapshot at the pinned txn
        AtomicPublish.readTableAt(spark, root, table, endTxn)
          .withColumn(ChangeTypeCol, lit("insert"))
      case Some(s) if s.txn == endTxn =>
        AtomicPublish.readTableAt(spark, root, table, endTxn).limit(0)
          .withColumn(ChangeTypeCol, lit("insert"))
      case Some(s) =>
        val diff =
          try AtomicPublish.changesWithDeletes(spark, root, table,
            s.txn, Some(endTxn))
          catch { case scala.util.control.NonFatal(e) =>
            throw new IllegalStateException(resyncMessage(table,
              s"version ${s.txn} is no longer readable (vacuumed?)"), e)
          }
        diff match {
          case None => throw new IllegalStateException(resyncMessage(
            table, s"the interval ${s.txn}..$endTxn rewrote the table"))
          case Some((ins, del)) =>
            val keyCols =
              if (!updateImages) None
              else AtomicPublish.deleteKeyColsAt(spark, root, table,
                endTxn)
            keyCols match {
              case None =>
                ins.withColumn(ChangeTypeCol, lit("insert"))
                  .unionByName(del.withColumn(ChangeTypeCol,
                    lit("delete")))
              case Some(keys) =>
                import org.apache.spark.sql.functions.{col, when}
                // keys present on BOTH sides of the interval are
                // updates. The key set is distinct tuples — usually
                // tiny next to the rows, and the planner/AQE broadcasts
                // it when it is; no forced broadcast hint, because a
                // snapshot-sized upsert interval can legitimately carry
                // millions of keys and must be allowed to shuffle
                val kc = keys.map(col)
                val updKeys = del.select(kc: _*).distinct()
                  .join(ins.select(kc: _*).distinct(), keys, "left_semi")
                def tag(side: DataFrame, hit: String, miss: String) =
                  side.join(updKeys.withColumn("__g_upd", lit(true)),
                    keys, "left")
                    .withColumn(ChangeTypeCol,
                      when(col("__g_upd").isNotNull, hit)
                        .otherwise(miss))
                    .drop("__g_upd")
                tag(ins, "update_postimage", "insert")
                  .unionByName(tag(del, "update_preimage", "delete"))
            }
        }
    }
    // lag registry: the NEXT batch diffs from endTxn — keep it alive
    AtomicPublish.recordConsumer(spark, root, consumerId, endTxn)
    // one streaming LEAF over the whole batch computation: the CDC
    // diff's tombstone anti-join must stay a batch join
    org.apache.spark.sql.graftstream.StreamingBridge.asStreamingLeaf(
      batch)
  }

  override def stop(): Unit = ()
}

object GraftChangeFeedSource {

  /** The signed-row discriminator column of the CDC feed. */
  val ChangeTypeCol = "_change_type"

  /** Thrown (inside the StreamingQueryException) when the owner chain
    * was rewritten under a running stream. */
  val ResyncRequired = "GRAFT_RESYNC_REQUIRED"

  private[streaming] def resyncMessage(table: String, what: String): String =
    s"$ResyncRequired: the owner chain of table '$table' was rewritten " +
      s"under this stream ($what) — a compaction/upsert replaced " +
      "segments, and a segment-offset feed cannot diff across a " +
      "rewrite. Fall back: bring downstream state current with a batch " +
      "read (e.g. MatView.refresh, which recomputes over a replace), " +
      "then restart the stream from a FRESH checkpoint (its first " +
      "batch re-delivers the full current snapshot)."

  /** CDC offset: the commit txn the stream has consumed through.
    * Versions are immutable, so the offset alone replay-determines the
    * batch. */
  final case class TxnOffset(txn: String) extends Offset {
    override def json(): String = s"""{"txn":"$txn"}"""
  }

  object TxnOffset {
    private val Re = """\{"txn":"([^"]*)"\}""".r
    def of(o: org.apache.spark.sql.connector.read.streaming.Offset)
        : TxnOffset = o match {
      case t: TxnOffset => t
      case s: SerializedOffset => parse(s.json)
      case other => parse(other.json())
    }
    def parse(json: String): TxnOffset = json match {
      case Re(t) => TxnOffset(t)
      case _ => throw new IllegalArgumentException(
        s"not a graft CDC offset: $json")
    }
  }

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
