package graft.tools

import org.apache.spark.sql.{Row, SparkSession}

import graft.etl.PatientIngestion

/** Runnable end-to-end demo of the ingestion pipeline — the library's
  * public surface driven the way an application would:
  * `sbt "runMain graft.tools.IngestDemo"`.
  * Mirrors the reference's mixed-batch scenario
  * (/root/reference/tests/test_pipeline.py:58-71).
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def patient(mrn: String, consent: Boolean): Row =
      Row("Patient", mrn, "Jane Doe", "1990-01-15", "female", "123-45-6789",
        Map("data_sharing" -> consent, "research" -> false))

    val batch = PatientIngestion.batchFromRows(spark, Seq(
      patient("MRN-1", consent = true),
      patient("MRN-2", consent = false),
      Row("Patient", "MRN-3", null, null, null, null, null), // invalid: no name
    ))

    // staged (observable) mode
    val summary = PatientIngestion.pipeline().run(Map("raw_records" -> batch))
    println(s"run status: ${summary.status}")
    summary.tasks.foreach { case (name, r) =>
      val counts = r.result.collect { case (k, v: Long) => s"$k=$v" }.mkString(" ")
      println(f"  $name%-14s ${r.status.value}%-8s ${r.durationMs}%8.1fms  $counts")
    }
    println("pipeline dag: " + PatientIngestion.pipeline().toJson)

    // single-pass (scale) mode
    val r = PatientIngestion.ingest(batch)
    println(s"single-pass counts: ${r.counts}")
    println("loaded records:")
    r.loaded.show(20, 60)
    println("consent blocked:")
    r.consentBlocked.show()
    println("validation errors:")
    r.validationErrors.selectExpr("mrn", "errors").show(20, 80)
    spark.stop()
  }
}
