package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.EventQueries
import graft.etl.PatientIngestion

/** Streaming bindings equal their batch counterparts on bounded input —
  * the §2.8 claim that the engine's transforms are execution-mode
  * agnostic. */
class StreamingOpsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling window (AvailableNow) equals batch e1 result") {
    implicit val s = spark
    val stream = StreamingOps.eventsStream(spark, dir)
    assert(stream.isStreaming)
    val out = StreamingOps.runToCompletion(
      StreamingOps.tumblingWindowAgg(stream), "e1_stream")
      .orderBy(col("hour"), col("event_type")).collect().toSeq
    val batch = EventQueries.e1TumblingWindow(spark, dir).collect().toSeq
    assert(out == batch)
  }

  test("watermarked streaming dedup keeps one row per event_id") {
    implicit val s = spark
    val stream = StreamingOps.eventsStream(spark, dir)
    val out = StreamingOps.runToCompletion(
      StreamingOps.dedupStream(stream), "dedup_stream", outputMode = "append")
    val expected = graft.core.Tables.events(spark, dir)
      .select("event_id").distinct().count()
    assert(out.count() == expected)
  }

  test("stateful sessionization (flatMapGroupsWithState) equals batch e2") {
    implicit val s = spark
    val stream = StreamingOps.eventsStream(spark, dir)
    val out = StreamingOps.runToCompletion(
      StreamingOps.sessionizeStream(stream).toDF(), "sess_stream",
      outputMode = "append")
      .orderBy(col("user_id")).collect().toSeq
    val batch = EventQueries.e2Sessionization(spark, dir).collect().toSeq
    assert(out == batch)
  }

  test("patient pipeline binds to a stream via foreachBatch (bounded micro-batch)") {
    // stream source: fixture rows as json files in a temp dir
    val tmp = Files.createTempDirectory("graft-stream-in").toFile
    val json = Seq(
      """{"resourceType":"Patient","mrn":"MRN-1","name":"Jane Doe","birthDate":"1990-01-15","gender":"female","ssn":"123-45-6789","consent":{"data_sharing":true,"research":false}}""",
      """{"resourceType":"Patient","mrn":"MRN-2","name":"No Consent","birthDate":"1991-02-16","gender":"male","ssn":null,"consent":{"data_sharing":false}}""",
      """{"resourceType":"Patient","mrn":"MRN-3"}""",
    ).mkString("\n")
    Files.writeString(new java.io.File(tmp, "batch0.json").toPath, json)

    val stream = spark.readStream.schema(PatientIngestion.inputSchema)
      .json(tmp.getAbsolutePath)

    var counts: Option[PatientIngestion.IngestCounts] = None
    val q = StreamingOps.ingestEachBatch(stream) { (result, _) =>
      counts = Some(result.counts)
    }
    q.awaitTermination()
    // mixed-batch invariant from the reference tests: 3 in, 2 valid,
    // 1 consented, 1 loaded (tests/test_pipeline.py:58-71)
    val c = counts.get
    assert(c.extract == 3 && c.valid == 2 && c.consented == 1 && c.loaded == 1)
  }
}
