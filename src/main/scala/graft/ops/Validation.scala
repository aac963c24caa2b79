package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Declarative validation-rule compiler (SURVEY.md §2.2 V1, §1.4).
  *
  * The reference validates each record against a JSON-Schema Draft-7
  * document, collecting ALL error messages instead of failing fast
  * (/root/reference/app/services/validation.py:14-20); invalid records are
  * quarantined, never fatal (/root/reference/app/etl/pipeline.py:41-61).
  *
  * Here each Draft-7 constraint compiles to a Catalyst `Column` predicate
  * producing an optional error message; the per-row error set is
  * `filter(array(...), notNull)` — plain built-in expressions, fully
  * codegen'd, no UDF. At 100 TB this validates in the same whole-stage
  * codegen pass as the scan: zero extra shuffles, zero extra scans for the
  * valid/invalid split (a filter and its complement over one lineage).
  *
  * Draft-7 presence semantics are preserved: constraint rules only fire on
  * non-null values; `Required` fires on null/missing. Error prose follows
  * the jsonschema library's shape closely enough that substring assertions
  * on the field name hold (tests/test_validation.py:22-23 checks only
  * `"mrn" in e`), without chasing byte-equality (SURVEY.md §7.4.4).
  */
object Validation {

  sealed trait Rule {
    /** Error-message column: NULL when the row passes this rule. */
    def errorCol(df: DataFrame): Column
  }

  /** required: null/missing field (Draft-7 `required`). */
  final case class Required(field: String) extends Rule {
    def errorCol(df: DataFrame): Column =
      when(fieldOrNull(df, field).isNull, lit(s"'$field' is a required property"))
  }

  /** const: exact value match, checked only when present. */
  final case class ConstEq(field: String, value: String) extends Rule {
    def errorCol(df: DataFrame): Column = {
      val c = fieldOrNull(df, field)
      when(c.isNotNull && c =!= lit(value), concat(lit(s"'$value' was expected for '$field', got '"), c, lit("'")))
    }
  }

  /** enum: membership in a closed value set. */
  final case class EnumIn(field: String, values: Seq[String]) extends Rule {
    def errorCol(df: DataFrame): Column = {
      val c = fieldOrNull(df, field)
      when(c.isNotNull && !c.isin(values: _*),
        concat(lit("'"), c, lit(s"' is not one of ${values.mkString("[", ", ", "]")} for '$field'")))
    }
  }

  /** pattern: full-string regex (Draft-7 `pattern` is a search; the
    * reference's patterns are all ^...$-anchored so match ≡ search). */
  final case class Pattern(field: String, regex: String) extends Rule {
    def errorCol(df: DataFrame): Column = {
      val c = fieldOrNull(df, field)
      when(c.isNotNull && !c.rlike(regex),
        concat(lit("'"), c, lit(s"' does not match '$regex' for '$field'")))
    }
  }

  /** minLength on a string field. */
  final case class MinLength(field: String, n: Int) extends Rule {
    def errorCol(df: DataFrame): Column = {
      val c = fieldOrNull(df, field)
      when(c.isNotNull && length(c) < n, lit(s"'$field' is shorter than minLength $n"))
    }
  }

  /** additionalProperties:false — closed-world column check. A column not
    * in `allowed` is an error on every row where it is non-null (the
    * columnar analog of "key present in the dict"). */
  final case class ClosedSchema(allowed: Set[String]) extends Rule {
    def errorCol(df: DataFrame): Column = {
      val extras = df.columns.filterNot(allowed.contains)
      if (extras.isEmpty) lit(null).cast("string")
      else {
        val anyExtraSet = extras.map(col(_).isNotNull).reduce(_ || _)
        when(anyExtraSet,
          lit(s"additional properties are not allowed (${extras.mkString(", ")})"))
      }
    }
  }

  /** required inside a nested object (Draft-7 sub-schema `required`):
    * fires only when the PARENT object is present but the child is null —
    * a missing parent is the top-level `Required`'s error, and Draft-7
    * evaluates sub-schemas only on present values. */
  final case class RequiredNested(parent: String, child: String) extends Rule {
    def errorCol(df: DataFrame): Column =
      pathCol(df, parent) match {
        case None => lit(null).cast("string")
        case Some(p) =>
          val c = pathCol(df, s"$parent.$child").getOrElse(lit(null))
          when(p.isNotNull && c.isNull,
            lit(s"'$child' is a required property"))
      }
  }

  /** Draft-7 `items` + `required` over an `array<struct>` column: every
    * element must carry a non-null `field`. `exists` over the array is a
    * single codegen'd HigherOrderFunction — no explode, no shuffle, the
    * whole check stays in the scan's whole-stage pass. An empty array is
    * vacuously valid (Draft-7 items semantics); a struct type that lacks
    * the field entirely fails on every non-empty array. */
  final case class ItemsRequired(arrayPath: String, field: String) extends Rule {
    def errorCol(df: DataFrame): Column =
      pathCol(df, arrayPath) match {
        case None => lit(null).cast("string")
        case Some(arr) =>
          val itemMissing: Column => Column =
            if (pathType(df, s"$arrayPath.$field").isDefined)
              x => x.getField(field).isNull
            else _ => lit(true)
          when(arr.isNotNull && exists(arr, itemMissing),
            lit(s"'$field' is a required property"))
      }
  }

  /** DataType at a dotted path, descending through structs and array
    * elements; None when any segment is missing — rules referencing
    * absent fields degrade to always-null (a dict without the key). */
  private def dataTypeAt(dt: DataType, parts: List[String]): Option[DataType] =
    parts match {
      case Nil => Some(dt)
      case head :: rest => dt match {
        case st: StructType =>
          st.find(_.name == head).flatMap(f => dataTypeAt(f.dataType, rest))
        case ArrayType(et, _) => dataTypeAt(et, head :: rest)
        case _ => None
      }
    }

  private def pathType(df: DataFrame, path: String): Option[DataType] =
    dataTypeAt(df.schema, path.split('.').toList)

  private def pathCol(df: DataFrame, path: String): Option[Column] =
    pathType(df, path).map(_ => col(path))

  /** Tolerate rules referencing fields absent from the DataFrame: absent ≡
    * always-null (a dict without the key). */
  private def fieldOrNull(df: DataFrame, field: String): Column =
    pathCol(df, field).getOrElse(lit(null).cast("string"))

  /** Compile a rule set to one `array<string>` errors column (empty array =
    * valid). Spark 4's `filter` lambda keeps this codegen-friendly. */
  def errorsColumn(df: DataFrame, rules: Seq[Rule]): Column =
    filter(array(rules.map(_.errorCol(df)): _*), _.isNotNull)

  /** Annotate with `errors`; split = `filter(size(errors)===0)` vs
    * complement on one lineage. */
  def withErrors(df: DataFrame, rules: Seq[Rule], errCol: String = "errors"): DataFrame =
    df.withColumn(errCol, errorsColumn(df, rules))

  /** The FHIR Patient contract (reference /root/reference/app/schemas/fhir.py:11-58). */
  val fhirPatientRules: Seq[Rule] = Seq(
    Required("resourceType"), Required("mrn"), Required("name"),
    ConstEq("resourceType", "Patient"),
    MinLength("mrn", 1),
    MinLength("name", 1),
    Pattern("birthDate", "^\\d{4}-\\d{2}-\\d{2}$"),
    EnumIn("gender", Seq("male", "female", "other", "unknown")),
    Pattern("ssn", "^\\d{3}-\\d{2}-\\d{4}$"),
    ClosedSchema(Set("resourceType", "mrn", "name", "birthDate", "gender",
      "ssn", "consent")),
  )

  /** The FHIR Observation contract — the FULL declared schema at
    * reference fhir.py:61-100: top-level required/const/enum, the nested
    * `code.required=[coding]`, per-item `system`/`code` requirements on
    * `code.coding[]`, and the closed top-level property set.
    * (`valueQuantity.value/unit` typing is carried by the typed struct
    * schema itself — columnar data can't hold a mistyped member.) */
  val fhirObservationRules: Seq[Rule] = Seq(
    Required("resourceType"), Required("status"), Required("code"),
    ConstEq("resourceType", "Observation"),
    EnumIn("status", Seq("registered", "preliminary", "final", "amended")),
    RequiredNested("code", "coding"),
    ItemsRequired("code.coding", "system"),
    ItemsRequired("code.coding", "code"),
    ClosedSchema(Set("resourceType", "status", "code", "valueQuantity")),
  )
}
