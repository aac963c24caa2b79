package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSuite

/** S4 conflict detection + S3 consent fan-out (SURVEY.md §2.1). */
class SinksSpec extends SparkSuite {

  private val kv = StructType(Seq(
    StructField("mrn", StringType), StructField("v", IntegerType)))

  private def df(rows: Row*) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), kv)

  test("conflict split: existing keys and in-batch duplicates are conflicts") {
    val batch = df(Row("A", 1), Row("B", 2), Row("B", 3), Row("C", 4))
    val existing = df(Row("C", 0), Row("D", 0))
    val split = Sinks.detectConflicts(batch, existing, "mrn", Seq(col("v")))
    assert(split.insertable.select("mrn").collect().map(_.getString(0)).sorted
      .toSeq == Seq("A", "B"))
    // one B dupe + C already present
    assert(split.conflicts.select("mrn").collect().map(_.getString(0)).sorted
      .toSeq == Seq("B", "C"))
  }

  test("conflict split with empty existing table inserts all distinct keys") {
    val batch = df(Row("A", 1), Row("B", 2))
    val split = Sinks.detectConflicts(batch, df(), "mrn", Seq(col("v")))
    assert(split.insertable.count() == 2)
    assert(split.conflicts.count() == 0)
  }

  test("duplicate winner is the orderBy minimum on ANY partition layout") {
    val batch = df(Row("A", 5), Row("A", 1), Row("A", 3), Row("B", 2))
    for (parts <- Seq(1, 3, 7)) {
      val relaid = batch.repartition(parts)
      val split = Sinks.detectConflicts(relaid, df(), "mrn", Seq(col("v")))
      val winner = split.insertable.filter(col("mrn") === "A").collect()
      assert(winner.map(_.getInt(1)).toSeq == Seq(1),
        s"parts=$parts: winner must be v=1 regardless of layout")
      assert(split.conflicts.filter(col("mrn") === "A").count() == 2)
    }
  }

  test("consent map fans out to one row per (patient, type, granted)") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("consent", MapType(StringType, BooleanType))))
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("p1", Map("data_sharing" -> true, "research" -> false)))),
      schema)
    val out = Sinks.consentRowsFromBatch(batch, "id").collect()
      .map(r => (r.getAs[String]("patient_id"), r.getAs[String]("consent_type"),
        r.getAs[Boolean]("granted"))).sortBy(_._2)
    assert(out.toSeq == Seq(("p1", "data_sharing", true), ("p1", "research", false)))
    // granted_at only set when granted
  }
}
