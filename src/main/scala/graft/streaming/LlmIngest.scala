package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.analytics.LlmPrep
import graft.ops.{AtomicPublish, Compaction, Sinks}

/** CONTINUOUS training-data ingest — the streaming face of the LLM-prep
  * journey, composed from the same stage functions:
  *
  *   micro-batch of raw docs
  *     → quarantine/clean (map-only)
  *     → batch-local exact dedup (window over the micro-batch)
  *     → anti-join against the PUBLISHED fingerprint set (n1b steady
  *       state: the corpus text is never re-read; the join side is
  *       16 bytes/doc)
  *     → quality gate (map-only)
  *     → chunk
  *     → ONE atomic DELTA publish per micro-batch: the batch's slice is
  *       written, history is carried by REFERENCE (publishDelta) — the
  *       per-trigger write cost is O(batch), not O(corpus), and a
  *       reader polling between batches always sees a complete,
  *       mutually consistent store.
  *
  * Concurrency: the parent txn is pinned ONCE per batch, every store
  * read resolves at that txn, and the delta commit is conditional on
  * the parent still being live (optimistic concurrency; same-JVM
  * exact). A lost race re-runs the batch against the new current —
  * admitted content stays exactly-once because the anti-join re-reads
  * the winner's fingerprints.
  *
  * Append-stable by layout: a replayed source file (same content)
  * anti-joins away against the published fingerprints, so at-least-once
  * delivery upstream still yields exactly-once content in the store.
  * The cross-doc stages (near-dup, decontamination) are deliberately
  * NOT in the hot path — they need corpus-wide context and run as
  * scheduled batch maintenance over the published store (the same split
  * the reference makes between its request path and its pipeline runs). */
object LlmIngest {

  /** The corpus itself — admitted documents with their text (what
    * training reads, and what cross-doc maintenance re-analyzes). */
  val DocsTable = "docs"
  val ChunksTable = "chunks"
  val KeptTable = "kept_docs"
  val RunsTable = "ingest_runs"

  /** Retries when a concurrent committer wins the pointer race. */
  private val MaxAttempts = 5

  /** Target bytes per written file — every corpus-sized write derives
    * its partition count from bytes/this (the Compaction contract), so
    * no write path ever funnels a large table through one task. */
  val TargetFileBytes: Long = 128L * 1024 * 1024

  /** When any store table's owner-segment count exceeds this after a
    * commit, the ingest loop consolidates it in place — the policy hook
    * that keeps a long-running ingest's segment count (and manifest
    * size) bounded without an external maintenance scheduler. */
  val AutoCompactOwners = 16

  /** Output partitions for a batch-sized slice: the slice is cached, so
    * its optimized-plan stats carry REAL in-memory bytes (an over-
    * estimate of parquet bytes — compression — which only errs toward
    * more, smaller files; compaction consolidates). Micro-batches land
    * on 1; a large backfill through the same entry point scales. */
  private def slicePartitions(df: DataFrame): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    Compaction.partitionsFor(
      bytes.min(BigInt(Long.MaxValue)).toLong, TargetFileBytes)
  }

  /** The fingerprint set at `parent`, or an empty frame before the
    * first publish. */
  private def fingerprintsAt(spark: SparkSession, root: String,
      parent: Option[String]): DataFrame =
    parent match {
      case Some(txn) =>
        AtomicPublish.readTableAt(spark, root, KeptTable, txn)
          .select(col("fingerprint"))
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("fingerprint",
              org.apache.spark.sql.types.StringType))))
    }

  /** Process ONE batch of raw documents against the store (the
    * foreachBatch body, callable directly for batch backfills).
    * Returns the number of genuinely new docs admitted. */
  def ingestBatch(spark: SparkSession, root: String, batch: DataFrame,
      runName: String): Long = {
    val t0 = System.currentTimeMillis()
    // one cache covers every consumer of the batch (count + pipeline)
    // without re-reading the source files per pass
    val docs = batch.select(col("doc_id"), col("text")).cache()
    try {
      val nIn = docs.count()
      var attempt = 0
      while (true) {
        attempt += 1
        val parent = AtomicPublish.currentTxn(spark, root) // pinned ONCE
        val novel = LlmPrep.qualityStage(
          LlmPrep.dedupStage(LlmPrep.cleanStage(docs))
            .withColumn("fingerprint", LlmPrep.fingerprintCol)
            .join(fingerprintsAt(spark, root, parent),
              Seq("fingerprint"), "left_anti"))
          .cache()
        try {
          val nNew = novel.count()
          val run = Sinks.pipelineRunRow(spark, runName, "completed",
            new java.sql.Timestamp(t0),
            new java.sql.Timestamp(System.currentTimeMillis()),
            inputCount = nIn, outputCount = nNew,
            errorsJson = "[]", dagJson = "{}")
          // a fully-replayed batch (nNew == 0) appends ONLY the run row:
          // empty segment dirs on docs/chunks/kept would otherwise grow
          // every manifest's owner list per at-least-once replay
          val tables: Map[String, DataFrame] =
            if (nNew == 0) Map(RunsTable -> run)
            else {
              // byte-derived slice sizing (micro-batch → 1 file; a bulk
              // backfill through this same entry point scales out), and
              // repartition (not coalesce) keeps the upstream parallel
              val parts = slicePartitions(novel)
              Map(
                DocsTable -> novel.select("doc_id", "text").repartition(parts),
                ChunksTable -> LlmPrep.chunkStage(novel.select("doc_id", "text"))
                  .repartition(parts),
                KeptTable -> novel.select(col("doc_id"), col("fingerprint"))
                  .repartition(1), // 16 B/doc: never larger than one file
                RunsTable -> run)
            }
          AtomicPublish.publishDelta(spark, root,
            append = tables, parent = parent) match {
            case Some(txn) =>
              autoCompact(spark, root, txn)
              return nNew
            case None if attempt < MaxAttempts => () // lost the race: retry
            case None => throw new IllegalStateException(
              s"ingest '$runName' lost the commit race $MaxAttempts times")
          }
        } finally {
          novel.unpersist()
          ()
        }
      }
      0L // unreachable
    } finally {
      docs.unpersist()
      ()
    }
  }

  /** The ingest loop's compaction policy: after a commit, any table
    * whose owner-segment list exceeded [[AutoCompactOwners]] is
    * consolidated via [[Compaction.compactStore]] (one replace delta
    * per table; byte-derived file sizing; CAS-retried against
    * concurrent appenders). Bounded work: a consolidation rewrites one
    * table's live union once per ~AutoCompactOwners triggers, and the
    * superseded segment chain becomes vacuum-reclaimable. Failure is
    * non-fatal — the commit that triggered it has already landed, and
    * the next trigger retries. */
  private def autoCompact(spark: SparkSession, root: String,
      txn: String): Unit =
    try {
      AtomicPublish.manifestOf(spark, root, txn).foreach {
        case (table, owners) if owners.size > AutoCompactOwners =>
          Compaction.compactStore(spark, root, table, TargetFileBytes)
          ()
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Batch MAINTENANCE over the published store — the cross-doc stages
    * the streaming hot path defers, run exactly as the journey runs
    * them: near-dup removal (exact shingle-Jaccard across the FULL
    * corpus) then decontamination (eval slice + n-gram-overlap train
    * docs), committed as ONE replace delta of `docs` + `chunks`.
    *
    * `kept_docs` is deliberately CARRIED UNCHANGED: it is the dedup
    * barrier, not the corpus roster — a fingerprint whose doc
    * maintenance dropped stays barred, so a replayed copy of a dropped
    * near-duplicate is not re-admitted only to be re-dropped (the store
    * converges instead of churning). Chunks are recomputed from the
    * surviving docs (a derived view, consistent by construction).
    *
    * CAS semantics as everywhere: pinned parent, retry against a
    * winning appender. Returns (docs dropped, committing txn). */
  def maintain(spark: SparkSession, root: String,
      targetFileBytes: Long = TargetFileBytes): (Long, String) = {
    var attempt = 0
    while (attempt < 5) {
      attempt += 1
      val parent = AtomicPublish.currentTxn(spark, root).getOrElse(
        throw new IllegalStateException(s"no published store under $root"))
      val docs = AtomicPublish.readTableAt(spark, root, DocsTable, parent)
      val nBefore = docs.count()
      val kept = LlmPrep.decontamStage(LlmPrep.nearDupStage(docs), docs)
        .cache()
      try {
        val nAfter = kept.count()
        // the replace is CORPUS-sized: partition counts derive from the
        // table's actual on-disk bytes (the Compaction contract), never
        // a fixed count — at 100 TB a repartition(1) here would funnel
        // the whole store through one task
        val docBytes = Compaction.storeTableBytes(spark, root,
          DocsTable, parent)
        val parts = Compaction.partitionsFor(
          math.max(1L, docBytes * nAfter / math.max(1L, nBefore)),
          targetFileBytes)
        AtomicPublish.publishDelta(spark, root, append = Map.empty,
          replace = Map(
            DocsTable -> kept.repartition(parts),
            ChunksTable -> LlmPrep.chunkStage(kept).repartition(parts)),
          parent = Some(parent)) match {
          case Some(txn) => return (nBefore - nAfter, txn)
          case None => () // an appender won; re-pin and retry
        }
      } finally {
        kept.unpersist()
        ()
      }
    }
    throw new IllegalStateException(
      s"maintain lost the commit race 5 times under $root")
  }

  /** Bind a raw-document stream to the store: one atomic delta publish
    * per micro-batch via foreachBatch (the engine's transactional-sink
    * escape hatch — the publish itself is the reference's single
    * db.commit() per request, applied per trigger). Pass a
    * `checkpoint` for restartable deployments (processed source files
    * are then never re-read across restarts); run names are unique per
    * (stream start, batch id) so restarted runs never collide in the
    * runs table. */
  def ingestStream(docs: DataFrame, root: String,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val runTag = java.util.UUID.randomUUID().toString.take(8)
    val writer = docs.writeStream
      .outputMode("append")
      .trigger(trigger)
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch.sparkSession, root, batch,
          s"llm_ingest_${runTag}_$id")
        ()
      }
      .start()
  }
}
