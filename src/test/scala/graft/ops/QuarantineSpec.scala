package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite

class QuarantineSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  private def annotated = Quarantine.annotateJson(
    Seq(
      (1L, """{"k": 7, "s": "ok"}"""),   // good
      (2L, """{"k": 8}"""),              // good (s not required)
      (3L, """{bad json"""),             // corrupt bytes
      (4L, """{"s": "no k"}"""),         // parses, missing required k
      (5L, """{"k": null, "s": "x"}"""), // explicit null ≡ missing
      (6L, null.asInstanceOf[String]),   // null input
      (7L, """not json at all"""),       // corrupt bytes
    ).toDF("id", "raw"), "raw", schema, required = Seq("k"))

  test("good/bad split: every row lands exactly once, reasons are ranked") {
    val bad = Quarantine.badRows(annotated)
      .select("id", Quarantine.ReasonCol).as[(Long, String)].collect().toMap
    assert(bad == Map(
      3L -> Quarantine.ReasonCorrupt,
      4L -> Quarantine.ReasonMissingRequired,
      5L -> Quarantine.ReasonMissingRequired,
      6L -> Quarantine.ReasonNullInput,
      7L -> Quarantine.ReasonCorrupt))
    val good = Quarantine.goodRows(annotated)
      .select(col("id"), col("parsed.k"), col("parsed.s"))
      .collect().toSet
    assert(good == Set(Row(1L, 7L, "ok"), Row(2L, 8L, null)))
  }

  test("quarantined rows keep raw evidence; good rows shed the capture column") {
    val bad = Quarantine.badRows(annotated)
    val raws = bad.select("id", "raw").as[(Long, String)].collect().toMap
    assert(raws(3L) == """{bad json""" && raws(7L) == """not json at all""")
    assert(raws(6L) == null)
    // capture column present on the quarantine side, stripped on the good side
    assert(bad.select(col(s"parsed.${Quarantine.CorruptCol}")).columns.nonEmpty)
    val goodFields = Quarantine.goodRows(annotated).schema("parsed")
      .dataType.asInstanceOf[StructType].fieldNames.toSet
    assert(goodFields == Set("k", "s"))
  }

  test("split is exhaustive and disjoint (filter + complement, one lineage)") {
    val n = annotated.count()
    assert(Quarantine.goodRows(annotated).count() +
      Quarantine.badRows(annotated).count() == n)
  }

  test("no required fields: only parse failures quarantine") {
    val ann = Quarantine.annotateJson(
      Seq((1L, """{"z": 1}"""), (2L, "{{")).toDF("id", "raw"), "raw", schema)
    assert(Quarantine.badRows(ann).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("reserved capture column in user schema is rejected") {
    intercept[IllegalArgumentException] {
      Quarantine.annotateJson(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        StructType(Seq(StructField(Quarantine.CorruptCol, StringType))))
    }
  }

  test("inputs already carrying the parsed/reason columns are rejected, not overwritten") {
    // withColumn would silently REPLACE an existing column — corrupting
    // either user data (parsedCol) or the split's evidence (ReasonCol)
    intercept[IllegalArgumentException] {
      Quarantine.annotateJson(
        Seq(("{}", "user-data")).toDF("raw", "parsed"), "raw", schema)
    }
    intercept[IllegalArgumentException] {
      Quarantine.annotateJson(
        Seq(("{}", "prior")).toDF("raw", Quarantine.ReasonCol), "raw", schema)
    }
    // a custom parsedCol dodges the collision on its own
    val ann = Quarantine.annotateJson(
      Seq(("{}", "user-data")).toDF("raw", "parsed"), "raw", schema,
      parsedCol = "parsed2")
    assert(ann.columns.count(_ == "parsed") == 1)
  }

  test("quarantine binds unchanged to a stream (execution-mode agnostic)") {
    // annotateJson is plain Column expressions, so the same call works on
    // a streaming DataFrame — the bad-rows side becomes a live quarantine
    // feed. AvailableNow + memory sink, as in StreamingOpsSpec.
    val dir = java.nio.file.Files.createTempDirectory("graft-quar-stream")
      .resolve("in").toString
    Seq((1L, """{"k": 5}"""), (2L, """{oops"""), (3L, """{"z": 1}"""))
      .toDF("id", "raw").coalesce(1).write.json(dir)
    val stream = spark.readStream
      .schema("id LONG, raw STRING").json(dir)
    val annotated = Quarantine.annotateJson(stream, "raw", schema,
      required = Seq("k"))
    assert(annotated.isStreaming)
    val q = Quarantine.badRows(annotated)
      .select(col("id"), col(Quarantine.ReasonCol).as("reason"))
      .writeStream.format("memory").queryName("quar_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("quar_stream").as[(Long, String)].collect().toMap
    assert(out == Map(2L -> Quarantine.ReasonCorrupt,
      3L -> Quarantine.ReasonMissingRequired))
  }

  test("e5b query: quarantine slice matches the mod-97 mangling exactly") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.analytics.EventQueries.e5bJsonQuarantine(spark, dir)
      .select("event_id", "reason").as[(Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, reason) =>
      val expected = (id % 97) match {
        case 0 => Quarantine.ReasonCorrupt
        case 1 => Quarantine.ReasonMissingRequired
        case m => fail(s"unmangled event_id $id (mod $m) in quarantine")
      }
      assert(reason == expected, s"event_id $id")
    }
    // every mangled id is caught — none slip through to the good side
    val expectedBad = graft.core.Tables.events(spark, dir)
      .filter(pmod(col("event_id"), lit(97)) <= 1).count()
    assert(out.length == expectedBad)
  }
}
