package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Source-format coverage (SURVEY.md §2.1 S1): the engine reads parquet
  * (primary), JSON lines (ingest payloads), CSV, and ORC through the
  * same DataFrame surface — every query in SparkEntry is
  * format-agnostic because it consumes DataFrames, so swapping the
  * storage format is a reader change, not an operator change. Each
  * round-trip pins schema + value fidelity; the ORC case also pins
  * predicate pushdown (columnar formats keep scan-level filtering). */
class SourcesSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def nationSorted =
    graft.core.Tables.nation(spark, dir).orderBy(col("n_nationkey"))

  test("CSV round-trip with header + explicit schema") {
    val tmp = Files.createTempDirectory("graft-src").resolve("csv").toString
    val orig = nationSorted
    orig.write.option("header", "true").csv(tmp)
    val back = spark.read.option("header", "true").schema(orig.schema).csv(tmp)
      .orderBy(col("n_nationkey"))
    assert(back.schema == orig.schema)
    assert(back.collect().toSeq == orig.collect().toSeq)
  }

  test("JSON-lines round-trip with explicit schema") {
    val tmp = Files.createTempDirectory("graft-src").resolve("json").toString
    val orig = nationSorted
    orig.write.json(tmp)
    val back = spark.read.schema(orig.schema).json(tmp)
      .orderBy(col("n_nationkey"))
    assert(back.collect().toSeq == orig.collect().toSeq)
  }

  test("ORC round-trip; predicate reaches the ORC scan") {
    val tmp = Files.createTempDirectory("graft-src").resolve("orc").toString
    val orig = graft.core.Tables.customer(spark, dir)
    orig.write.orc(tmp)
    val back = spark.read.orc(tmp)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    val filtered = back.filter(col("c_custkey") < 10)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"), plan)
    assert(filtered.count() ==
      orig.filter(col("c_custkey") < 10).count())
  }

  test("schema evolution on read: mergeSchema unifies a two-generation lineage") {
    val base = Files.createTempDirectory("graft-src").resolve("evolved").toString
    val cust = graft.core.Tables.customer(spark, dir)
    cust.select(col("c_custkey"), col("c_name"))
      .limit(10).write.parquet(s"$base/gen1")
    cust.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .filter(col("c_custkey") > 100).limit(10).write.parquet(s"$base/gen2")
    // without mergeSchema, Spark picks ONE footer: reading the pair can
    // silently lose the evolved column; with it, the union schema holds
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen1", s"$base/gen2")
    assert(merged.columns.toSet == Set("c_custkey", "c_name", "c_acctbal"))
    // pre-evolution rows surface NULL for the new column; explicit
    // default fill completes the read-side migration
    val filled = merged.withColumn("acctbal_filled",
      coalesce(col("c_acctbal"), lit(0.0)))
    assert(filled.filter(col("c_acctbal").isNull).count() == 10)
    assert(filled.filter(col("acctbal_filled").isNull).count() == 0)
    assert(merged.count() == 20)
  }

  test("a SparkEntry query runs unchanged over a re-formatted table") {
    // q1 consumes Tables.lineitem (parquet); the same logical query over
    // an ORC copy returns identical results — operators are
    // storage-agnostic
    val tmp = Files.createTempDirectory("graft-src").resolve("li_orc").toString
    graft.core.Tables.lineitem(spark, dir).write.orc(tmp)
    val orc = spark.read.orc(tmp)
    val fromOrc = orc.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
    val fromParquet = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
    assert(fromOrc == fromParquet)
  }
}
