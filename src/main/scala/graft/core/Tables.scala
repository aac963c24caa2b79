package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the harness testdata (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table under `dir` (= `/root/testdata/sf*`).
  * Reads are plain `spark.read.parquet` so Catalyst keeps full control of
  * column pruning and filter pushdown — callers select/filter lazily and the
  * scan only materializes what the query needs (verify with
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the accessor
  * indirection is the single place to swap that in (e.g. a bucketed
  * `spark.table(...)` co-located on join keys) without touching operators.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
