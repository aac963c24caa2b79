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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos (legacy long mode) and truncate to microseconds — integer
    * `DIV`, not `/`: epoch-nanos ≈ 1.7e18 exceeds a double's 53-bit
    * mantissa, so float division would corrupt low microseconds.
    * Truncation (not rounding) matches how DuckDB/pyarrow cast ns→µs,
    * keeping the DuckDB oracle hash-identical.
    *
    * The session must be BUILT with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Verify/Bench/SparkSuite
    * builders do) — this accessor is side-effect-free by design: a read
    * accessor silently flipping a session-wide legacy flag would change
    * how every other nanos parquet in the session reads, and race under
    * concurrent query construction. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      throw new IllegalStateException(
        "events.parquet carries TIMESTAMP(NANOS): build the session with " +
          "spark.sql.legacy.parquet.nanosAsLong=true (see Tables.events scaladoc)")
    val raw = apply(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Content fingerprint of `dir/name.parquet` from FS METADATA only
    * (file count, total bytes, newest mtime — no data read). Model/
    * staging caches key on (dir, fingerprint) so a table rewritten in
    * place (compaction, republish into the same path) invalidates the
    * cached derivation instead of silently serving stale state. */
  def fingerprint(spark: SparkSession, dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isFile) s"1:${st.getLen}:${st.getModificationTime}"
    else {
      val kids = fs.listStatus(p).filter(_.isFile)
      val mt = if (kids.isEmpty) 0L else kids.map(_.getModificationTime).max
      s"${kids.length}:${kids.map(_.getLen).sum}:$mt"
    }
  }
}
