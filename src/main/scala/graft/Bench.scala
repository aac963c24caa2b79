package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); set once at construction
      // so read accessors stay side-effect-free (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm fixed costs once so they don't land on whichever query runs
    // first: JVM/codegen bring-up, parquet reader init + footer reads,
    // Dataset-encoder codegen, and a shuffle.
    locally {
      import spark.implicits._
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach { t =>
          val df = if (t == "events") graft.core.Tables.events(spark, sfDir)
                   else graft.core.Tables(spark, sfDir, t)
          df.count()
        }
      spark.range(1000).as[Long].mapPartitions(_.map(_ + 1))
        .groupBy(($"value" % 7).as("k")).count().count()
      // warm the heavy code paths (window + object-hash aggregate +
      // native dot product) on tiny slices so JIT/codegen bring-up
      // doesn't land on whichever LSH/ANN query happens to run first
      graft.analytics.DedupOps.minhashSignatures(
        graft.core.Tables.documents(spark, sfDir).limit(64)).count()
      graft.analytics.SimilarityOps.srpBuckets(
        graft.core.Tables.embeddings(spark, sfDir).limit(64)
          .selectExpr("vec_id", "cast(embedding as array<double>) as v",
            "cast(1.0 as double) as nrm"), 6).count()
      // from_json (JsonToStructs) is CodegenFallback with its own
      // Jackson/parser bring-up; e5 is its only user, so without this
      // warm the ~4s one-time cost lands entirely on e5's measurement
      // (steady-state e5 is ~0.6s at sf0.1)
      spark.range(64).selectExpr("""from_json('{"k":1}', 'k LONG') as p""")
        .select("p.k").count()
    }
    // Per-query MINIMUM over `reps` INTERLEAVED rounds in this one JVM.
    // A single run is hostage to GC pauses and box noise (±30% observed
    // round to round). Back-to-back reps of one query share the same
    // noise burst, so rounds are interleaved — a query's samples land
    // ~a full sweep apart — and the minimum is reported: for a fixed
    // plan on fixed data it is the steady-state cost, the quantity
    // that actually reflects a plan regression (noise only ever ADDS
    // time). Measured run-to-run at sf0.1: min-of-5 interleaved holds
    // every heavyweight query and the total within ~5% and the
    // per-query median spread at ~7% (median-of-3 consecutive saw
    // ±30%); what remains is one-sided box drift on sub-0.3s queries,
    // which no rep count removes.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val names = SparkEntry.queries.keys.toSeq
    val samples = (1 to reps).flatMap { _ =>
      names.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    // a rep that threw contributes no sample: a consistently failing
    // query reports -1 (unmistakable in the driver's JSON) instead of
    // its time-to-exception masquerading as a fast success.
    // groupBy on a Seq keeps encounter (= round) order within each
    // group, so ts(0) is always the round-1 sample.
    val ordered = samples.groupBy(_._1).map { case (n, s) =>
      n -> s.filter(_._3).map(_._2) }
    val results = ordered.map { case (name, ts) =>
      name -> (if (ts.isEmpty) -1.0 else ts.min) }
    val failed = results.collect { case (n, t) if t < 0 => n }
    if (failed.nonEmpty)
      System.err.println(s"[bench] FAILED (all $reps reps threw): " +
        failed.mkString(", "))
    // Spread diagnostics to stderr (stdout stays the one-line contract).
    // Round 1 pays one-time bring-up for queries with JVM-memoized model
    // state (evolved-scan staging, IVF codebooks): folding it into the
    // spread overstates noise for exactly those queries, so bring-up
    // (round1/steady-min) and steady-state spread (rounds 2..N) are
    // reported separately.
    val steady = ordered.collect { case (n, ts) if ts.size >= 2 =>
      n -> ts.drop(1).sorted }
    val spreads = steady.collect { case (name, ts) if ts.head > 0 =>
      name -> (ts.last - ts.head) / ts.head }.toSeq.sortBy(-_._2)
    System.err.println(f"[bench] reps=$reps worst steady spreads " +
      "(rounds 2..N): " +
      spreads.take(3).map { case (n, s) => f"$n=$s%.2f" }.mkString(" "))
    val bringUp = ordered.collect {
      case (name, ts) if ts.size >= 2 && ts.drop(1).min > 0 =>
        name -> ts.head / ts.drop(1).min }.toSeq.sortBy(-_._2)
    System.err.println(f"[bench] worst bring-up (round1/steady-min): " +
      bringUp.take(3).map { case (n, s) => f"$n=$s%.2fx" }.mkString(" "))
    // ms precision keeps the one-line contract SHORT: the driver
    // captures a bounded stdout tail, and a 125-query map at full
    // double precision overflows it (BENCH_r06–r08 "parsed": null) —
    // 3 decimals halves the line and loses nothing a benchmark needs
    def r3(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // per-query MEDIAN of the steady rounds (2..N — round 1 carries
    // one-time bring-up) rides next to the min (VERDICT r12 #8):
    // the min is the plan-regression metric (noise only adds time),
    // the median is the stable number regression TRIAGE starts from —
    // two queries whose medians overlap within spread need no
    // attribution A/B at all
    val medians = ordered.map { case (name, ts0) =>
      val ts = (if (ts0.size >= 2) ts0.drop(1) else ts0).sorted
      name -> (if (ts.isEmpty) -1.0 else ts(ts.size / 2))
    }
    val ms = medians.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"medians":$ms,"sf":"$sfDir"}""")
    // The driver captures a bounded stdout TAIL: the long per-query line
    // above can get its head (where "metric":"total" lives) cut off
    // (BENCH_r06–r09 "parsed": null). Emit a short summary LAST — the
    // tail always contains the final line — so the total stays parseable
    // regardless of how many queries the big line carries.
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
