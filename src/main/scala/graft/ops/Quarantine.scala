package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Corrupt-input quarantine — the [[Validation]] fail-soft pattern applied
  * one layer down, to bytes that don't PARSE (vs records that don't
  * VALIDATE).
  *
  * The reference never halts on a bad record: it collects the error and
  * moves on (/root/reference/app/etl/pipeline.py:44-61). `Validation`
  * mirrors that for schema rules over parsed rows; this mirrors it for
  * unparseable payloads, which any 100 TB corpus contains. The mechanism
  * is Spark's PERMISSIVE JSON parse: the declared schema is extended with
  * a `columnNameOfCorruptRecord` string field, so a payload that fails to
  * parse yields a row whose data fields are null and whose corrupt column
  * holds the raw bytes — nothing is dropped, nothing throws.
  *
  * Like `Validation`, the good/bad split is a filter and its complement
  * over ONE annotated lineage: zero extra shuffles, zero extra scans, and
  * the annotation is plain built-in expressions inside the same
  * whole-stage-codegen pass as the scan.
  */
object Quarantine {

  val CorruptCol = "_corrupt_record"
  val ReasonCol = "quarantine_reason"

  /** Reasons, checked in order: unparseable bytes trump missing fields. */
  val ReasonNullInput = "null_input"
  val ReasonCorrupt = "corrupt"
  val ReasonMissingRequired = "missing_required"

  /** Parse `jsonCol` against `schema` in PERMISSIVE mode and annotate
    * every row with a `quarantine_reason` column (NULL = row is good).
    * The parsed struct lands in `parsedCol`; the raw payload column is
    * left untouched so quarantined rows keep their evidence.
    *
    * `required` lists fields that must be non-null after a successful
    * parse (a present-but-null field and an absent field are identical
    * post-parse, exactly as in `Validation.Required`).
    */
  def annotateJson(df: DataFrame, jsonCol: String, schema: StructType,
      required: Seq[String] = Nil, parsedCol: String = "parsed"): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is reserved for capture")
    require(!df.columns.contains(parsedCol),
      s"input already has a '$parsedCol' column — withColumn would " +
        "silently overwrite it; pass a different parsedCol")
    require(!df.columns.contains(ReasonCol),
      s"input already has a '$ReasonCol' column — it is reserved for the " +
        "good/bad split's evidence")
    val captureSchema = schema.add(CorruptCol, StringType)
    val parsed = from_json(col(jsonCol), captureSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol))
    val missingRequired: Column = required
      .map(f => col(parsedCol).getField(f).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    df.withColumn(parsedCol, parsed)
      .withColumn(ReasonCol,
        when(col(jsonCol).isNull, ReasonNullInput)
          .when(col(parsedCol).getField(CorruptCol).isNotNull, ReasonCorrupt)
          .when(missingRequired, ReasonMissingRequired))
  }

  /** Rows that parsed clean and carry all required fields; the capture
    * column is stripped (it is NULL here by construction). */
  def goodRows(annotated: DataFrame, parsedCol: String = "parsed"): DataFrame =
    annotated.filter(col(ReasonCol).isNull)
      .withColumn(parsedCol, col(parsedCol).dropFields(CorruptCol))
      .drop(ReasonCol)

  /** The quarantine: rows that failed to parse or lack required fields,
    * with the reason and the raw payload intact. */
  def badRows(annotated: DataFrame): DataFrame =
    annotated.filter(col(ReasonCol).isNotNull)
}
