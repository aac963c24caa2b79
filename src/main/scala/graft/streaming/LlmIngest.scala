package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.analytics.LlmPrep
import graft.ops.{AtomicPublish, Sinks}

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
  *     → ONE atomic publish per micro-batch: chunks ∪ new, fingerprints
  *       ∪ new, plus a run row — a reader polling between batches
  *       always sees a complete, mutually consistent store.
  *
  * Append-stable by layout: a replayed source file (same content)
  * anti-joins away against the already-published fingerprints, so
  * at-least-once delivery upstream still yields exactly-once content in
  * the store. The cross-doc stages (near-dup, decontamination) are
  * deliberately NOT in the hot path — they need corpus-wide context and
  * run as scheduled batch maintenance over the published store (the
  * same split the reference makes between its request path and its
  * pipeline runs). */
object LlmIngest {

  val ChunksTable = "chunks"
  val KeptTable = "kept_docs"
  val RunsTable = "ingest_runs"

  /** The published fingerprint set, or an empty frame before the first
    * publish. */
  private def publishedFingerprints(spark: SparkSession,
      root: String): DataFrame =
    AtomicPublish.currentTxn(spark, root) match {
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
      batchId: Long): Long = {
    val t0 = System.currentTimeMillis()
    val nIn = batch.count()
    val novel = LlmPrep.qualityStage(
      LlmPrep.dedupStage(LlmPrep.cleanStage(
        batch.select(col("doc_id"), col("text"))))
        .withColumn("fingerprint", md5(col("text").cast("binary")))
        .join(publishedFingerprints(spark, root),
          Seq("fingerprint"), "left_anti"))
    // the micro-batch is small; one cache covers the three consumers
    // (chunks, fingerprints, count) without re-running the anti-join
    novel.cache()
    try {
      val nNew = novel.count()
      val newChunks = LlmPrep.chunkStage(novel.select("doc_id", "text"))
      val newKept = novel.select(col("doc_id"), col("fingerprint"))
      val (chunks, kept, runs) = AtomicPublish.currentTxn(spark, root) match {
        case Some(txn) =>
          (AtomicPublish.readTableAt(spark, root, ChunksTable, txn),
            AtomicPublish.readTableAt(spark, root, KeptTable, txn),
            Some(AtomicPublish.readTableAt(spark, root, RunsTable, txn)))
        case None => (newChunks.limit(0), newKept.limit(0), None)
      }
      val run = Sinks.pipelineRunRow(spark, s"llm_ingest_$batchId",
        "completed", new java.sql.Timestamp(t0),
        new java.sql.Timestamp(System.currentTimeMillis()),
        inputCount = nIn, outputCount = nNew,
        errorsJson = "[]", dagJson = "{}")
      AtomicPublish.publish(spark, root, Map(
        ChunksTable -> chunks.unionByName(newChunks),
        KeptTable -> kept.unionByName(newKept),
        RunsTable -> runs.fold(run)(_.unionByName(run))))
      nNew
    } finally {
      novel.unpersist()
      ()
    }
  }

  /** Bind a raw-document stream to the store: one atomic publish per
    * micro-batch via foreachBatch (the engine's transactional-sink
    * escape hatch — the publish itself is the reference's single
    * db.commit() per request, applied per trigger). */
  def ingestStream(docs: DataFrame, root: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch.sparkSession, root, batch, id)
        ()
      }
      .start()
}
