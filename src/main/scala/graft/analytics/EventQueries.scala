package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Event-time analytics over the `events` table (SURVEY.md §2.8).
  *
  * The reference has no streaming engine — its "event-driven" surface is a
  * bounded HTTP micro-batch — so these are the batch-expressible
  * event-time analogs (tumbling windows, sessionization, JSON props
  * access) that stay DuckDB-oracle-checkable. The same transforms bind
  * unchanged to `readStream` (see graft.streaming.EventStreams) because
  * they are plain Column expressions over a timestamped source.
  */
object EventQueries {

  private def r2(c: Column): Column = round(c, 2)

  /** Tumbling 1-hour event-time window per event type. Uses Spark's
    * `window()` (the streaming-compatible form); its window.start equals
    * date_trunc('hour') for a 1h/0-offset tumble, which is what the
    * oracle pins. */
  def e1TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  val e1TumblingWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Sessionization: a session break is a >30-minute gap in a user's
    * event stream; emits per-user session and event counts. One shuffle
    * (partition by user) carries the whole computation — the classic
    * scale shape for gap-based sessionization. */
  def e2Sessionization(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val e2SessionizationSql: String =
    """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN lag(ts, 1) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |) t GROUP BY user_id ORDER BY user_id""".stripMargin

  /** X8/X9: JSON property extraction from the `props` JSON-string column,
    * aggregated per event type. */
  def e3JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))

  val e3JsonExtractSql: String =
    """SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_with_k
      |FROM (SELECT event_type,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Two-phase SALTED aggregation over a deliberately skewed key
    * (5 event_type values — every row lands on one of 5 reducers in a
    * naive groupBy). Phase 1 fans each hot key across 16 salt buckets
    * (deterministic salt from event_id, not rand(), so the result is
    * reproducible and oracle-checkable); phase 2 merges the 5×16
    * partials. Same answer as the plain groupBy — the oracle IS the
    * plain groupBy — but the wide shuffle is uniform. This is the manual
    * skew technique for when AQE skew handling can't see the skew
    * (first-shuffle aggregations). */
  def e4SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("psum")), 2).as("sum_value"))
      .orderBy(col("event_type"))

  val e4SaltedAggSql: String =
    """SELECT event_type, count(*) AS n_events,
      |round(sum(value), 2) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val SkewSalts = 16

  /** Salt-REPLICATION equi-join — e4's sibling for joins: the fact side
    * tags each row with a deterministic salt, the (small-but-unbroadcastable
    * at scale) build side replicates once per salt value, and the join key
    * becomes (key, salt) — a hot key's rows spread over `salts` reducers
    * instead of one. Result identical to the plain join (the oracle IS the
    * plain join). Use when AQE's skew splitting can't apply (e.g. the
    * build side must co-shuffle) and the dim is too big to broadcast. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: Column, salts: Int): DataFrame = {
    val f = fact.withColumn("__salt", pmod(saltFrom, lit(salts)).cast("int"))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** E6: per-event deviation from its type's mean value, via saltedJoin
    * on the 5-value (maximally skewed) event_type key. */
  def e6SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = ev.groupBy(col("event_type"))
      .agg(round(avg(col("value")), 4).as("type_avg"))
    saltedJoin(ev, dim, "event_type", col("event_id"), SkewSalts)
      .select(col("event_id"), col("event_type"),
        r2(col("value") - col("type_avg")).as("dev"))
      .orderBy(col("event_id"))
  }

  val e6SkewJoinSql: String =
    """WITH dim AS (SELECT event_type, round(avg(value), 4) AS type_avg
      |             FROM events GROUP BY event_type)
      |SELECT event_id, e.event_type, round(value - type_avg, 2) AS dev
      |FROM events e JOIN dim USING (event_type)
      |ORDER BY event_id""".stripMargin

  /** E7: as-of join — for each error event, the most recent click of the
    * same user at-or-before it (error attribution). Clicks are
    * pre-deduped per (user, ts) — the [[AsofJoin.asofLast]] contract —
    * keeping the max event_id. Oracle: DuckDB's native ASOF LEFT JOIN,
    * which pins the exact inclusive semantics the merge formulation
    * implements. */
  def e7AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts"), col("click_id"),
        col("ts").as("click_ts"))
    AsofJoin.asofLast(errs, clicks, "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  val e7AsofJoinSql: String =
    """WITH errs AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
      |clicks AS (
      |  SELECT user_id, ts, max(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT e.event_id, e.user_id, c.click_id,
      |  epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
      |FROM errs e ASOF LEFT JOIN clicks c
      |  ON e.user_id = c.user_id AND e.ts >= c.ts
      |ORDER BY e.event_id""".stripMargin

  val BandSeconds = 1800

  /** E8: banded (interval) self-join — ordered same-user event pairs
    * within 30 minutes, counted per user. The naive formulation is a
    * per-key cross product filtered by the band; this one bins time at
    * the band width so a qualifying pair sits in the same or adjacent
    * bin: each left row probes (bin, bin+1), the equi-join on
    * (user, bin) generates only near pairs, and the exact band predicate
    * prunes the remainder. Candidate volume is Σ occupancy² over bins —
    * linear in data for bounded event rate — instead of Σ per-user n².
    * (This is the time-domain analog of the SRP/PPJoin candidate
    * patterns; Spark has no native range join.) */
  def e8BandJoin(spark: SparkSession, dir: String): DataFrame =
    e8BandJoinOn(Tables.events(spark, dir))

  def e8BandJoinOn(events: DataFrame): DataFrame = {
    val bandUs = BandSeconds * 1000000L
    val ev = events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
      .withColumn("bin", expr(s"t DIV $bandUs")) // integer DIV: exact bins
    val probe = ev.withColumn("bin",
      explode(array(col("bin"), col("bin") + 1L)))
      .toDF("a_id", "user_id", "a_t", "bin")
    probe.join(ev.toDF("b_id", "user_id", "b_t", "bin"), Seq("user_id", "bin"))
      .filter((col("b_t") > col("a_t")) ||
        (col("b_t") === col("a_t") && col("b_id") > col("a_id")))
      .filter(col("b_t") - col("a_t") <= bandUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  val e8BandJoinSql: String =
    s"""SELECT a.user_id, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
      | AND epoch_us(b.ts) - epoch_us(a.ts) <= ${BandSeconds}000000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  /** E9: NATIVE session windows — `session_window(ts, gap)`, the
    * operator Spark ships for gap-based sessionization (and the same
    * expression works under readStream with a watermark, where closed
    * sessions emit incrementally). e2 builds sessions manually from a
    * lag window — the portable formulation — while this one lets the
    * engine merge session intervals inside one aggregation; both are a
    * single shuffle on the session key. Boundary semantics: each event
    * claims [ts, ts+gap] and TOUCHING intervals merge, so an event at
    * exactly last+gap CONTINUES the session; only a strictly larger gap
    * splits — the oracle pins that with a strict `>` gap test (same
    * boundary as e2's manual lag formulation), and
    * EventQueriesSpec runs a literal exact-gap case to keep it pinned. */
  def e9SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  val e9SessionWindowSql: String =
    """WITH m AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |    THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Schema-full JSON parse (from_json with a declared StructType, the
    * typed sibling of e3's path extraction) + null-safety of malformed
    * rows. */
  def e5JsonStruct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).as("p"))
      .select(col("event_id"), col("p.k").as("k"))
      .filter(col("k").isNotNull)
      .orderBy(col("event_id"))

  val e5JsonStructSql: String =
    """SELECT event_id,
      |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** E5b: corrupt-input quarantine over a deterministically mangled
    * payload stream — every event_id ≡ 0 (mod 97) gets structurally
    * broken JSON, every ≡ 1 valid JSON missing the required field. The
    * PERMISSIVE parse captures unparseable bytes instead of dropping or
    * throwing ([[graft.ops.Quarantine]] — the reference's fail-soft
    * record handling, pipeline.py:44-61, applied to parsing); this query
    * emits the quarantine side with reasons and raw evidence. At 100 TB
    * the split is a filter + complement on one scan lineage — no second
    * pass over the corpus to find the bad rows. */
  def e5bJsonQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val mangled = Tables.events(spark, dir)
      .withColumn("raw",
        when(pmod(col("event_id"), lit(97)) === 0, concat(lit("{bad"), col("props")))
          .when(pmod(col("event_id"), lit(97)) === 1, lit("""{"v": 1}"""))
          .otherwise(col("props")))
      .select(col("event_id"), col("raw"))
    val annotated = graft.ops.Quarantine.annotateJson(
      mangled, "raw",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))),
      required = Seq("k"))
    graft.ops.Quarantine.badRows(annotated)
      .select(col("event_id"),
        col(graft.ops.Quarantine.ReasonCol).as("reason"), col("raw"))
      .orderBy(col("event_id"))
  }

  val e5bJsonQuarantineSql: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 97 = 0 THEN '{bad' || props
      |         WHEN event_id % 97 = 1 THEN '{"v": 1}'
      |         ELSE props END AS raw
      |  FROM events),
      |k AS (
      |  SELECT event_id, raw,
      |    CASE WHEN json_valid(raw)
      |         THEN json_extract_string(raw, '$.k') END AS k
      |  FROM raw)
      |SELECT event_id,
      |  CASE WHEN raw IS NULL THEN 'null_input'
      |       WHEN NOT json_valid(raw) THEN 'corrupt'
      |       ELSE 'missing_required' END AS reason,
      |  raw
      |FROM k
      |WHERE raw IS NULL OR NOT json_valid(raw) OR k IS NULL
      |ORDER BY event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_tumbling_window" -> (e1TumblingWindow _),
    "e2_sessionization" -> (e2Sessionization _),
    "e3_json_extract" -> (e3JsonExtract _),
    "e4_salted_agg" -> (e4SaltedAgg _),
    "e5_json_struct" -> (e5JsonStruct _),
    "e5b_json_quarantine" -> (e5bJsonQuarantine _),
    "e6_skew_join" -> (e6SkewJoin _),
    "e7_asof_join" -> (e7AsofJoin _),
    "e8_band_join" -> (e8BandJoin _),
    "e9_session_window" -> (e9SessionWindow _),
  )

  def oracleSql: Map[String, String] = Map(
    "e1_tumbling_window" -> e1TumblingWindowSql,
    "e2_sessionization" -> e2SessionizationSql,
    "e3_json_extract" -> e3JsonExtractSql,
    "e4_salted_agg" -> e4SaltedAggSql,
    "e5_json_struct" -> e5JsonStructSql,
    "e5b_json_quarantine" -> e5bJsonQuarantineSql,
    "e6_skew_join" -> e6SkewJoinSql,
    "e7_asof_join" -> e7AsofJoinSql,
    "e8_band_join" -> e8BandJoinSql,
    "e9_session_window" -> e9SessionWindowSql,
  )
}
