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
  /** Mount memo, (session, dir, table, [[fingerprint]])-keyed: every
    * `spark.read.parquet` resolves the datasource afresh — file listing
    * plus a footer read for schema inference — and the bench mounts
    * each table once per query per rep, so the fixed mount cost ran
    * thousands of times per sweep. The cached value is the LAZY mounted
    * frame (a plan, never rows). The outer map is a synchronized
    * WeakHashMap keyed on the SparkSession itself (the
    * GraftCatalog.autoPins pattern — ADVICE r15: identityHashCode keys
    * can collide/be reused after GC, serving one session's plan — bound
    * to a possibly stopped session — to another, and they strongly
    * retain dead sessions' plans forever); a session's entries are
    * GC-collected with the session. The inner fingerprint check
    * re-mounts when a file is rewritten in place (staged test corpora). */
  private val mountCache: java.util.Map[SparkSession,
      scala.collection.concurrent.TrieMap[String, (String, DataFrame)]] =
    java.util.Collections.synchronizedMap(new java.util.WeakHashMap())

  private def mountsOf(spark: SparkSession)
      : scala.collection.concurrent.TrieMap[String, (String, DataFrame)] =
    mountCache.synchronized {
      var m = mountCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap
          .empty[String, (String, DataFrame)]
        mountCache.put(spark, m)
      }
      m
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val fp = fingerprint(spark, dir, name)
    val mounts = mountsOf(spark)
    val key = s"$dir/$name"
    mounts.get(key) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = spark.read.parquet(s"$dir/$name.parquet")
        mounts.put(key, (fp, df))
        df
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  /** `events.ts` normalization: the generator has shipped the column as
    * parquet TIMESTAMP(NANOS) (older rounds) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (current), and every event query computes in
    * the `unix_micros` instant domain — so this accessor admits each
    * physical encoding and lands all of them on TimestampType (UTC
    * instant):
    *
    *  - NANOS reads as raw longs under `nanosAsLong=true`
    *    (Verify/Bench/SparkSuite builders set it; Spark's vectorized
    *    reader rejects NANOS otherwise, [PARQUET_TYPE_ILLEGAL]) and is
    *    truncated to microseconds — integer `DIV`, not `/`: epoch-nanos
    *    ≈ 1.7e18 exceeds a double's 53-bit mantissa, so float division
    *    would corrupt low microseconds; truncation matches how
    *    DuckDB/pyarrow cast ns→µs, keeping the oracle hash-identical.
    *  - MICROS-naive surfaces as TIMESTAMP_NTZ and is cast to the
    *    instant type: sessions here run `spark.sql.session.timeZone=UTC`
    *    so the cast is micros-value-preserving — the same instants the
    *    NANOS path produced, and the same naive values the DuckDB
    *    oracle reads.
    *
    * Side-effect-free by design: a read accessor silently flipping a
    * session-wide legacy flag would change how every other nanos
    * parquet in the session reads, and race under concurrent query
    * construction. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // NANOS read as raw longs (legacy long mode)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Per-(dir, table) memo that re-computes when the table's content
    * fingerprint changes. One live entry per key (a rewrite REPLACES
    * the stale value), so the cache is bounded by the number of
    * distinct tables a JVM touches. Check-then-put is deliberately
    * non-atomic: two racers may both compute, the loser's put wins,
    * both results are correct for the fingerprint they saw (benign
    * recompute, no lock on the read path). Shared by the model caches
    * in SimilarityOps and the staged-lineage cache in AdvancedQueries. */
  def memoFresh[V](
      cache: scala.collection.concurrent.TrieMap[String, (String, V)],
      spark: SparkSession, dir: String, table: String)(compute: => V): V = {
    val fp = fingerprint(spark, dir, table)
    val key = s"$dir/$table" // never collide two tables of one dir
    cache.get(key) match {
      case Some((`fp`, v)) => v
      case _ =>
        val v = compute
        cache.put(key, (fp, v))
        v
    }
  }

  /** Content fingerprint of `dir/name.parquet` from FS METADATA only
    * (recursive file count, total bytes, newest mtime — no data read).
    * Model/staging caches key on (dir, table, fingerprint) so a table
    * rewritten in place (compaction, republish into the same path)
    * invalidates the cached derivation instead of silently serving
    * stale state. The walk is RECURSIVE so partitioned layouts (data
    * only under partition subdirectories) fingerprint their real
    * contents — a top-level-only listing would see zero files and
    * return a constant, never invalidating. Limits of a metadata
    * fingerprint: a rewrite keeping file count, total bytes AND newest
    * mtime (ms resolution) identical is invisible — vanishingly
    * unlikely for real writes, which create fresh files with fresh
    * timestamps. */
  def fingerprint(spark: SparkSession, dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isFile) s"1:${st.getLen}:${st.getModificationTime}"
    else if (fs.getScheme == "file") {
      // java.nio walk on local dirs (VERDICT r15 #8): the Hadoop
      // recursive listing materializes per-file permission bits via a
      // subprocess (~7 ms/file — the exact cost GraftFileIndex's
      // listing fast path removed), which would make the memo GUARD
      // itself expensive on directory-shaped tables. Follows links and
      // falls back to the Hadoop listing on walk errors.
      val base = java.nio.file.Paths.get(
        fs.makeQualified(p).toUri.getPath)
      try {
        val stream = java.nio.file.Files.walk(base,
          java.nio.file.FileVisitOption.FOLLOW_LINKS)
        try {
          var n = 0L; var bytes = 0L; var mt = 0L
          stream.forEach { f =>
            if (java.nio.file.Files.isRegularFile(f)) {
              n += 1; bytes += java.nio.file.Files.size(f)
              val m = java.nio.file.Files.getLastModifiedTime(f).toMillis
              if (m > mt) mt = m
            }
          }
          s"$n:$bytes:$mt"
        } finally stream.close()
      } catch {
        case _: java.io.UncheckedIOException |
             _: java.nio.file.FileSystemLoopException =>
          hadoopDirFingerprint(fs, p)
      }
    } else hadoopDirFingerprint(fs, p)
  }

  private def hadoopDirFingerprint(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val it = fs.listFiles(p, true)
    var n = 0L; var bytes = 0L; var mt = 0L
    while (it.hasNext) {
      val f = it.next()
      n += 1; bytes += f.getLen
      if (f.getModificationTime > mt) mt = f.getModificationTime
    }
    s"$n:$bytes:$mt"
  }
}
