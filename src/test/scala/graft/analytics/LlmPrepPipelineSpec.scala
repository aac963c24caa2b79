package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{Pipeline, Tables}
import graft.ops.{AtomicPublish, Sinks}

/** The LLM-prep USER JOURNEY end-to-end — the training-data sibling of
  * IngestJourneySpec: the DAG control plane threads ONE lazy lineage
  * through the journey stages (per-stage status/duration, the reference
  * observable), the store sees ONE atomic commit of chunks + kept-doc
  * fingerprints, run metadata (with the observe-collected per-stage
  * counts) appends afterwards like the reference's audit sink, and day
  * two ingests an incremental batch against the PUBLISHED fingerprints
  * (the n1b steady-state shape) without reprocessing the corpus. */
class LlmPrepPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("DAG journey → atomic publish → run metadata → incremental day two") {
    val root = java.nio.file.Files.createTempDirectory("llm-journey")
      .resolve("store").toString
    val docs = Tables.documents(spark, dir).select("doc_id", "text")

    // ---- day one: the composed journey as a control-plane DAG --------
    // stages register lazy transforms (the data plane stays one Catalyst
    // lineage, Pipeline's design contract); `publish` materializes once
    var jr: LlmPrep.JourneyRun = null
    val pipe = Pipeline("llm_prep")
      .addStage("compose", ctx => {
        jr = LlmPrep.instrumented(docs)
        ctx + ("chunks" -> jr.chunks)
      })
      .addStage("kept_fingerprints", ctx => {
        // published dedup state: 16 bytes/doc, the day-two anti-join side
        val kept = LlmPrep.qualityStage(LlmPrep.decontamStage(
          LlmPrep.nearDupStage(LlmPrep.dedupStage(
            LlmPrep.cleanStage(docs))), docs))
          .select(col("doc_id"), md5(col("text").cast("binary")).as("fingerprint"))
        ctx + ("kept" -> kept)
      }, dependsOn = Seq("compose"))
      .addStage("publish", ctx => {
        AtomicPublish.publish(spark, root, Map(
          "chunks" -> ctx("chunks").asInstanceOf[DataFrame],
          "kept_docs" -> ctx("kept").asInstanceOf[DataFrame]))
        ctx
      }, dependsOn = Seq("kept_fingerprints"))
    val summary = pipe.run()
    assert(summary.status == "completed")
    assert(summary("publish").status == Pipeline.TaskStatus.Success)

    // counts were collected DURING the publish action — no extra jobs
    val counts = jr.counts()
    val txn1 = AtomicPublish.currentTxn(spark, root).get
    def tbl(n: String, txn: String = ""): DataFrame =
      AtomicPublish.readTableAt(spark, root, n,
        if (txn.isEmpty) AtomicPublish.currentTxn(spark, root).get else txn)
    assert(tbl("kept_docs").count() == counts("n_quality_kept"))
    assert(tbl("chunks").select("doc_id").distinct().count() ==
      counts("n_quality_kept"))

    // run metadata appends AFTER the run, the reference audit-sink shape
    val run1 = Sinks.pipelineRunRow(spark, "llm_prep", summary.status,
      java.sql.Timestamp.valueOf("2026-01-02 00:00:00"),
      java.sql.Timestamp.valueOf("2026-01-02 00:10:00"),
      inputCount = counts("n_input"), outputCount = counts("n_quality_kept"),
      errorsJson = "[]", dagJson = pipe.toJson)
    AtomicPublish.publish(spark, root, Map(
      "chunks" -> tbl("chunks"), "kept_docs" -> tbl("kept_docs"),
      "pipeline_runs" -> run1))

    // ---- day two: incremental batch, published corpus untouched ------
    val stop = "the a and of to in is"
    val novel = stop + " " + (1 to 23).map(i => s"new$i").mkString(" ")
    // a verbatim copy of a doc the funnel KEPT (only kept fingerprints
    // are published; a copy of a REJECTED doc re-runs the funnel and is
    // re-rejected — append-stable either way, but only the kept case
    // exercises the anti-join)
    val dupOfPublished = docs
      .join(tbl("kept_docs").select("doc_id"), Seq("doc_id"))
      .orderBy("doc_id").limit(1).select(col("text")).as[String].head()
    val batch = Seq(900001L -> dupOfPublished, 900002L -> novel)
      .toDF("doc_id", "text")

    // batch-local clean+dedup, then the n1b anti-join against the
    // PUBLISHED fingerprints — the corpus text is never re-read
    val publishedFp = tbl("kept_docs").select("fingerprint")
    val newUnique = LlmPrep.dedupStage(LlmPrep.cleanStage(batch))
      .withColumn("fingerprint", md5(col("text").cast("binary")))
      .join(publishedFp, Seq("fingerprint"), "left_anti")
    val newKept = LlmPrep.qualityStage(
      LlmPrep.decontamStage(LlmPrep.nearDupStage(
        newUnique.select("doc_id", "text")), docs))
    val newChunks = LlmPrep.chunkStage(newKept)
    AtomicPublish.publish(spark, root, Map(
      "chunks" -> tbl("chunks").unionByName(newChunks),
      "kept_docs" -> tbl("kept_docs").unionByName(
        newKept.select(col("doc_id"),
          md5(col("text").cast("binary")).as("fingerprint"))),
      "pipeline_runs" -> tbl("pipeline_runs").unionByName(
        Sinks.pipelineRunRow(spark, "llm_prep_incremental", "completed",
          java.sql.Timestamp.valueOf("2026-01-03 00:00:00"),
          java.sql.Timestamp.valueOf("2026-01-03 00:01:00"),
          inputCount = 2L, outputCount = 1L,
          errorsJson = "[]", dagJson = "{}"))))

    // the dup contributed nothing; the novel doc landed with its chunk
    val txn3 = AtomicPublish.currentTxn(spark, root).get
    val keptNow = tbl("kept_docs", txn3)
    assert(keptNow.count() == counts("n_quality_kept") + 1)
    assert(keptNow.filter(col("doc_id") === 900001L).isEmpty)
    assert(tbl("chunks", txn3).filter(col("doc_id") === 900002L).count() == 1)
    // append-stable: replaying the same batch adds nothing
    val replay = LlmPrep.dedupStage(LlmPrep.cleanStage(batch))
      .withColumn("fingerprint", md5(col("text").cast("binary")))
      .join(keptNow.select("fingerprint"), Seq("fingerprint"), "left_anti")
    assert(replay.isEmpty)
    // two run records, each with its own counts; day one still travels
    assert(tbl("pipeline_runs", txn3).count() == 2)
    assert(tbl("chunks", txn1).select("doc_id").distinct().count() ==
      counts("n_quality_kept"))
  }
}
