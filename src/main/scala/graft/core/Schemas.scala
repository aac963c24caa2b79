package graft.core

import org.apache.spark.sql.types._

/** Target table schemas (SURVEY.md §1.2; reference
  * /root/reference/app/models/patient.py:34-136). PostgreSQL types map to
  * Spark types: UUID→string (generated with `uuid()`), JSONB→string-held
  * JSON (accessed via from_json/get_json_object), enums→string + isin
  * validation, TIMESTAMP→TimestampType with the session pinned to UTC.
  * Constraints (unique mrn, FKs, enum checks) have no engine enforcement
  * in Spark — they become dedup/anti-join/validation operators
  * (SURVEY.md §2.1 S4, §2.3 J3).
  */
object Schemas {

  /** patients (patient.py:34-52). */
  val patients: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("encrypted_name", StringType, nullable = false),
    StructField("encrypted_dob", StringType, nullable = false),
    StructField("encrypted_ssn", StringType),
    StructField("mrn", StringType, nullable = false), // unique via S4 anti-join
    StructField("gender", StringType),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false),
  ))

  /** consent_records (patient.py:55-76); unique (patient_id, consent_type)
    * via dropDuplicates. */
  val consentRecords: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("patient_id", StringType, nullable = false),
    StructField("consent_type", StringType, nullable = false), // data_sharing|research|treatment
    StructField("granted", BooleanType, nullable = false),
    StructField("granted_at", TimestampType),
    StructField("revoked_at", TimestampType),
    StructField("source_document", StringType),
  ))

  val consentTypes: Seq[String] = Seq("data_sharing", "research", "treatment")

  /** clinical_records (patient.py:79-99); partition by resource_type at
    * write — the columnar analog of its (patient_id, resource_type)
    * indexes. */
  val clinicalRecords: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("patient_id", StringType, nullable = false),
    StructField("resource_type", StringType, nullable = false),
    StructField("fhir_resource", StringType, nullable = false), // JSON text
    StructField("status", StringType, nullable = false),        // default 'active'
    StructField("recorded_at", TimestampType, nullable = false),
  ))

  /** audit_log (patient.py:102-116) — append-only (audit.py:25). */
  val auditLog: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("actor", StringType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("resource_type", StringType, nullable = false),
    StructField("resource_id", StringType),
    StructField("detail", StringType), // JSON text
    StructField("timestamp", TimestampType, nullable = false),
  ))

  /** pipeline_runs (patient.py:119-136). The reference stores record
    * counts as VARCHAR(16) — preserved only at this serialization edge. */
  val pipelineRuns: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("pipeline_name", StringType, nullable = false),
    StructField("status", StringType, nullable = false), // pending|running|completed|failed
    StructField("started_at", TimestampType),
    StructField("completed_at", TimestampType),
    StructField("input_record_count", StringType),  // VARCHAR quirk kept
    StructField("output_record_count", StringType),
    StructField("errors", StringType),         // JSON text
    StructField("dag_definition", StringType), // JSON text (Pipeline.toJson)
  ))

  val pipelineStatuses: Seq[String] = Seq("pending", "running", "completed", "failed")
}
