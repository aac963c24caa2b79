package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Observation-contract parity with the FULL declared schema at
  * /root/reference/app/schemas/fhir.py:61-100 — including the nested
  * `code.required=[coding]` and the per-item `system`/`code`
  * requirements on `code.coding[]` (array-item rules the scalar
  * compiler couldn't express in round 1). */
class ValidationSpec extends SparkSuite {

  private val codingType = ArrayType(StructType(Seq(
    StructField("system", StringType),
    StructField("code", StringType),
    StructField("display", StringType))))
  private val schema = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("status", StringType),
    StructField("code", StructType(Seq(StructField("coding", codingType)))),
    StructField("valueQuantity", StructType(Seq(
      StructField("value", DoubleType), StructField("unit", StringType))))))

  private def coding(system: String, code: String): Row =
    Row(system, code, "disp")

  private def obs(status: String = "final",
      code: Row = Row(Seq(coding("http://loinc.org", "8867-4"))),
      vq: Row = Row(72.0, "beats/min")): Row =
    Row("Observation", status, code, vq)

  private def errorsFor(rows: Row*): Seq[String] = {
    val df = spark.createDataFrame(rows.asJava, schema)
    Validation.withErrors(df, Validation.fhirObservationRules)
      .select("errors").head().getSeq[String](0)
  }

  test("valid observation has no errors") {
    assert(errorsFor(obs()).isEmpty)
  }

  test("code present without coding: nested required fires") {
    val errs = errorsFor(obs(code = Row(null)))
    assert(errs.exists(_.contains("'coding' is a required property")))
  }

  test("code missing entirely: only the top-level required fires") {
    val errs = errorsFor(Row("Observation", "final", null, null))
    assert(errs.count(_.contains("required")) == 1)
    assert(errs.exists(_.contains("code")))
  }

  test("coding item missing system is an item-level error") {
    val errs = errorsFor(obs(code = Row(Seq(
      coding("http://loinc.org", "8867-4"), Row(null, "8867-4", null)))))
    assert(errs.exists(_.contains("'system' is a required property")))
    assert(!errs.exists(_.contains("'code' is a required property")))
  }

  test("coding item missing code is an item-level error") {
    val errs = errorsFor(obs(code = Row(Seq(Row("http://loinc.org", null, null)))))
    assert(errs.exists(_.contains("'code' is a required property")))
  }

  test("empty coding array is vacuously valid (Draft-7 items semantics)") {
    assert(errorsFor(obs(code = Row(Seq.empty[Row]))).isEmpty)
  }

  test("status outside the enum is an error") {
    val errs = errorsFor(obs(status = "bogus"))
    assert(errs.exists(_.contains("status")))
  }

  test("wrong resourceType const is an error") {
    val errs = errorsFor(Row("Patient", "final",
      Row(Seq(coding("http://loinc.org", "8867-4"))), null))
    assert(errs.exists(_.contains("Observation")))
  }

  test("additionalProperties: extra non-null column is an error") {
    val widened = StructType(schema.fields :+ StructField("extra", StringType))
    val df = spark.createDataFrame(
      Seq(Row("Observation", "final",
        Row(Seq(coding("http://loinc.org", "8867-4"))), null, "surprise")).asJava,
      widened)
    val errs = Validation.withErrors(df, Validation.fhirObservationRules)
      .select("errors").head().getSeq[String](0)
    assert(errs.exists(_.contains("additional properties")))
  }
}
