package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Opaque media record: payload is an undecoded byte blob (image/audio/
  * video container bytes at 100 TB scale); metadata is typed columns so
  * catalog queries never touch payloads (column pruning keeps scans
  * payload-free — the parquet reader materializes `payload` only for
  * operators that decode). */
case class Media(
    media_id: Long,
    modality: String, // image | audio | video
    payload: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Long)

/** Decode output: per-media features + shape, payload dropped. */
case class Decoded(
    media_id: Long,
    modality: String,
    n_bytes: Long,
    mean_byte: Double,
    features: Array[Float])

/** Batch decode kernel — the extension point a real deployment fills
  * with an image/audio library. Batch-at-a-time (the Scala analog of a
  * pandas-batch UDF): implementations amortize per-batch setup (model
  * load, codec contexts) across `batchSize` records. */
trait MediaDecoder extends Serializable {
  def decodeBatch(batch: Seq[Media]): Seq[Decoded]
}

/** STUB decoder — deterministic fake. The container has no image/audio
  * codecs, so this derives "pixels" from payload bytes; the Spark-side
  * plumbing (schema, batching, partition preservation) is real and is
  * what the tests pin down. A production decoder replaces ONLY this
  * object. */
object StubDecoder extends MediaDecoder {
  val FeatureDim = 16

  def decodeBatch(batch: Seq[Media]): Seq[Decoded] = batch.map { m =>
    val bytes = m.payload
    val sums = new Array[Long](FeatureDim)
    val counts = new Array[Long](FeatureDim)
    var i = 0
    var total = 0L
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sums(i % FeatureDim) += v
      counts(i % FeatureDim) += 1
      total += v
      i += 1
    }
    val feats = Array.tabulate(FeatureDim) { j =>
      if (counts(j) == 0) 0f else (sums(j).toDouble / counts(j) / 255.0).toFloat
    }
    val mean = if (bytes.isEmpty) 0.0 else total.toDouble / bytes.length
    Decoded(m.media_id, m.modality, bytes.length.toLong, mean, feats)
  }
}

/** Multimodal-column operators (SURVEY.md §2.11 N5). Media rows are
  * derived deterministically from `documents` (payload = utf-8 text
  * bytes, metadata arithmetic on doc_id/n_chars) so catalog and
  * frame-sampling queries stay DuckDB-oracle-checkable; the decode path
  * exercises the real distributed pattern (typed Dataset →
  * mapPartitions → batched kernel) with the codec stubbed.
  *
  * Scale notes: decode is map-only — no shuffle, linear in corpus, and
  * the batch kernel amortizes model/codec setup. Frame sampling is a
  * generator (explode) — output rows ≫ input rows, so it repartitions
  * by (media_id, frame) downstream if a shuffle-heavy op follows.
  */
object MultimodalOps {

  val DefaultBatchSize = 64

  /** Deterministic media catalog from `documents`: modality by
    * doc_id mod 3, shapes/durations from n_chars. */
  def mediaCatalog(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        ((col("n_chars") % 640) + 1).cast("int").as("width"),
        ((col("n_chars") * 7 % 480) + 1).cast("int").as("height"),
        when(col("doc_id") % 3 === 1, 16000).otherwise(0)
          .cast("int").as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms"))
      .as[Media]
  }

  /** Distributed decode: batched mapPartitions over the typed Dataset.
    * Partition-preserving (no shuffle); batch size only affects kernel
    * amortization, never results (asserted in spec). */
  def decode(media: Dataset[Media],
             decoder: MediaDecoder = StubDecoder,
             batchSize: Int = DefaultBatchSize): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(b => decoder.decodeBatch(b)))
  }

  /** Resize: recompute target geometry preserving aspect ratio, and
    * (stub) resample the payload to the target pixel budget by striding.
    * Metadata math is real; the pixel resample is the stubbed kernel a
    * codec-backed deployment replaces. Map-only, partition-preserving. */
  def resize(media: Dataset[Media], maxDim: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      val nw = math.max(1, math.round(m.width * scale).toInt)
      val nh = math.max(1, math.round(m.height * scale).toInt)
      val stride = math.max(1, math.ceil(1.0 / math.max(scale, 1e-9)).toInt)
      val resampled =
        if (scale >= 1.0) m.payload
        else m.payload.grouped(stride).map(_.head).toArray // STUB resample
      m.copy(payload = resampled, width = nw, height = nh)
    }
  }

  // --- harness queries ---------------------------------------------------------

  /** MM1: payload-free media catalog stats — the "query metadata without
    * decoding" pattern. Column pruning must keep `payload` out of the
    * scan entirely. */
  def mm1MediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaCatalog(spark, dir).groupBy(col("modality")).agg(
        count(lit(1)).as("n_media"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(col("duration_ms")).as("sum_duration_ms"))
      .orderBy(col("modality"))

  val mm1MediaStatsSql: String =
    """WITH media AS (SELECT doc_id AS media_id,
      |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
      |  (n_chars % 640) + 1 AS width, (n_chars * 7 % 480) + 1 AS height,
      |  n_chars * 10 AS duration_ms FROM documents)
      |SELECT modality, count(*) AS n_media,
      |  sum(width)::BIGINT AS sum_width, sum(height)::BIGINT AS sum_height,
      |  sum(duration_ms)::BIGINT AS sum_duration_ms
      |FROM media GROUP BY modality ORDER BY modality""".stripMargin

  /** MM2: frame sampling — one row per 1-second frame of each video.
    * A generator (posexplode over a sequence), the standard
    * rows-multiplying shape of video pipelines. */
  def mm2FrameSample(spark: SparkSession, dir: String): DataFrame =
    mediaCatalog(spark, dir).toDF()
      .filter(col("modality") === "video")
      .select(col("media_id"),
        posexplode(sequence(lit(0L), (col("duration_ms") / 1000L).cast("long")))
          .as(Seq("frame_idx", "frame_sec")))
      .select(col("media_id"), col("frame_idx").cast("long"),
        (col("frame_sec") * 1000L).as("frame_ts_ms"))
      .orderBy(col("media_id"), col("frame_idx"))

  val mm2FrameSampleSql: String =
    """WITH media AS (SELECT doc_id AS media_id,
      |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
      |  n_chars * 10 AS duration_ms FROM documents),
      |frames AS (SELECT media_id,
      |    unnest(generate_series(0::BIGINT, duration_ms // 1000)) AS frame_idx
      |  FROM media WHERE modality = 'video')
      |SELECT media_id, frame_idx::BIGINT AS frame_idx,
      |  (frame_idx * 1000)::BIGINT AS frame_ts_ms
      |FROM frames ORDER BY media_id, frame_idx""".stripMargin

  val AudioWinMs = 1000L
  val AudioHopMs = 500L // 50% overlap

  /** MM4: overlapping audio segmentation — one row per 1-second window
    * at 500 ms hop over each audio track (the feature-extraction input
    * shape for speech models: frame sampling's audio sibling). The tail
    * window clips to the track end. Generator over metadata only —
    * payloads never load. */
  def mm4AudioWindows(spark: SparkSession, dir: String): DataFrame =
    mediaCatalog(spark, dir).toDF()
      .filter(col("sample_rate") > 0)
      .select(col("media_id"), col("duration_ms"),
        posexplode(sequence(lit(0L),
          greatest(col("duration_ms") - lit(AudioHopMs), lit(0L)),
          lit(AudioHopMs))).as(Seq("win_idx", "start_ms")))
      .select(col("media_id"), col("win_idx").cast("long").as("win_idx"),
        col("start_ms"),
        least(col("start_ms") + AudioWinMs, col("duration_ms")).as("end_ms"))
      .orderBy(col("media_id"), col("win_idx"))

  val mm4AudioWindowsSql: String =
    s"""WITH media AS (SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS sample_rate,
      |  n_chars * 10 AS duration_ms FROM documents),
      |wins AS (SELECT media_id, duration_ms,
      |    unnest(generate_series(0::BIGINT,
      |      greatest(duration_ms - $AudioHopMs, 0), $AudioHopMs)) AS start_ms
      |  FROM media WHERE sample_rate > 0)
      |SELECT media_id,
      |  (start_ms // $AudioHopMs)::BIGINT AS win_idx, start_ms,
      |  least(start_ms + $AudioWinMs, duration_ms) AS end_ms
      |FROM wins ORDER BY media_id, win_idx""".stripMargin

  /** MM3: decode + feature extraction end-to-end (stub kernel), then
    * per-modality feature summary. Exercises the full typed-Dataset
    * batch-decode path; no SQL oracle (kernel is engine-side). */
  def mm3DecodeFeatures(spark: SparkSession, dir: String): DataFrame =
    decode(mediaCatalog(spark, dir)).toDF()
      .groupBy(col("modality")).agg(
        count(lit(1)).as("n_decoded"),
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_f0"))
      .orderBy(col("modality"))

  /** The fixed public enumeration of feature-index pairs behind the
    * perceptual hash: the first 64 of the 120 ordered pairs of the 16
    * decode-kernel features, lexicographic. */
  val PhashPairs: Seq[(Int, Int)] =
    (for { i <- 0 until StubDecoder.FeatureDim
           j <- i + 1 until StubDecoder.FeatureDim } yield (i, j)).take(64)

  /** 64-bit PERCEPTUAL hash per media row: bit k = [features(a_k) >
    * features(b_k)] over [[PhashPairs]] — rank-correlation (
    * Winner-Take-All-family) hashing: each bit is a comparison, so the
    * hash is invariant to any monotonic distortion of the feature
    * scale, exactly the robustness a perceptual hash wants (re-encoded
    * or brightness-shifted media keeps its bit pattern). Map-only over
    * the decode output. */
  def mediaPhash(spark: SparkSession, dir: String): DataFrame =
    // one RankPairBits expression (r16): the former 64-term
    // when(element_at > element_at) + bitwiseOR chain inflated the
    // generated projection toward the method-size cliff and evaluated
    // 128 element_at calls per row; same bits (nan-safe float order =
    // GreaterThan's semantics, pinned in MultimodalOpsSpec)
    decode(mediaCatalog(spark, dir)).toDF()
      .select(col("media_id"),
        graft.functions.VectorFunctions
          .rankPairBits(col("features"), PhashPairs).as("simhash"))

  /** MM5: perceptual-hash NEAR-DUP pairs over media — the multimodal
    * face of the dedup tier: decode → 64-bit perceptual hash →
    * [[graft.analytics.DedupOps.simhashPairs]] banding. Because the
    * 4×16-bit banding is pigeonhole-COMPLETE for hamming ≤ 3, the
    * result equals brute-force all-pairs comparison exactly (spec-
    * pinned) while shuffling only (id, band, bucket) rows. Fully
    * SQL-oracled ([[mm5PhashNearDupSql]]): the stub decode kernel is
    * deterministic byte arithmetic, so the oracle re-derives the
    * features from hex-decoded UTF-8 bytes, reproduces the phash
    * bit-for-bit (same double→float rounding), and brute-forces the
    * pairs — pinning kernel, hash AND banding completeness at once. */
  def mm5PhashNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.analytics.DedupOps.simhashPairs(
        mediaPhash(spark, dir).withColumnRenamed("media_id", "doc_id"))
      .toDF("ma", "mb", "hamming")

  /** The decode kernel + phash, re-expressed in portable SQL: per-byte
    * values via hex(encode(text)) digit lookup; lane features as
    * (sum/count/255.0)::REAL — the same IEEE double arithmetic then
    * float truncation as [[StubDecoder]], so comparisons agree exactly;
    * the 64 [[PhashPairs]] regenerated as the first 64 lexicographic
    * (i<j) pairs; bit 63 spelled as BIGINT MinValue (DuckDB refuses the
    * overflowing 1<<63). Brute-force pairs stand in for the banding
    * because banding is complete at hamming ≤ 3. */
  val mm5PhashNearDupSql: String =
    """WITH raw AS (
      |  SELECT doc_id, hex(encode(text)) AS h,
      |         octet_length(encode(text)) AS n FROM documents),
      |byt AS (
      |  SELECT doc_id, ((p - 1) % 16)::INT AS lane,
      |    (strpos('0123456789ABCDEF', substring(h, 2*p-1, 1)) - 1) * 16
      |      + strpos('0123456789ABCDEF', substring(h, 2*p, 1)) - 1 AS v
      |  FROM raw, LATERAL unnest(generate_series(1, n)) AS u(p)),
      |feat AS (
      |  SELECT doc_id, lane,
      |    (sum(v)::DOUBLE / count(*)::DOUBLE / 255.0)::REAL AS f
      |  FROM byt GROUP BY doc_id, lane),
      |grid AS (
      |  SELECT d.doc_id, l.lane, coalesce(f.f, 0.0::REAL) AS f
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15))::INT AS lane) l
      |  LEFT JOIN feat f ON f.doc_id = d.doc_id AND f.lane = l.lane),
      |pairs AS (
      |  SELECT i, j, row_number() OVER (ORDER BY i, j) - 1 AS k
      |  FROM (SELECT a.i::INT AS i, b.j::INT AS j
      |        FROM (SELECT unnest(generate_series(0,15)) AS i) a,
      |             (SELECT unnest(generate_series(0,15)) AS j) b
      |        WHERE a.i < b.j ORDER BY i, j LIMIT 64)),
      |ph AS (
      |  SELECT ga.doc_id,
      |    bit_or(CASE WHEN ga.f > gb.f THEN
      |      CASE WHEN p.k = 63 THEN (-9223372036854775808)::BIGINT
      |           ELSE (1::BIGINT << p.k::INT) END
      |      ELSE 0::BIGINT END) AS simhash
      |  FROM pairs p
      |  JOIN grid ga ON ga.lane = p.i
      |  JOIN grid gb ON gb.lane = p.j AND gb.doc_id = ga.doc_id
      |  GROUP BY ga.doc_id)
      |SELECT a.doc_id AS ma, b.doc_id AS mb,
      |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
      |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY ma, mb""".stripMargin

  /** The mm3 readback re-expressed in portable SQL, riding the same
    * byte-derivation the mm5 oracle proved: per-doc `mean_byte` is an
    * exact-integer ratio (`sum(v)/n`, the kernel's `total/len`), lane-0
    * features reproduce the kernel's double→float truncation, and the
    * per-modality averages round at 4 dp on both sides. A kernel drift
    * (stride bug, lane mixup, mean over the wrong denominator) flips
    * the hash. Empty payloads join defensively (kernel: mean 0.0,
    * f0 = 0). */
  val mm3DecodeFeaturesSql: String =
    """WITH raw AS (
      |  SELECT doc_id, hex(encode(text)) AS h,
      |         octet_length(encode(text)) AS n FROM documents),
      |byt AS (
      |  SELECT doc_id, ((p - 1) % 16)::INT AS lane,
      |    (strpos('0123456789ABCDEF', substring(h, 2*p-1, 1)) - 1) * 16
      |      + strpos('0123456789ABCDEF', substring(h, 2*p, 1)) - 1 AS v
      |  FROM raw, LATERAL unnest(generate_series(1, n)) AS u(p)),
      |perdoc AS (
      |  SELECT doc_id,
      |    sum(v)::DOUBLE / count(*)::DOUBLE AS mean_byte,
      |    (sum(CASE WHEN lane = 0 THEN v END)::DOUBLE /
      |     count(CASE WHEN lane = 0 THEN v END)::DOUBLE / 255.0)::REAL
      |      AS f0
      |  FROM byt GROUP BY doc_id),
      |m AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality
      |  FROM documents)
      |SELECT m.modality, count(*)::BIGINT AS n_decoded,
      |  round(avg(coalesce(p.mean_byte, 0.0)), 4) AS avg_mean_byte,
      |  round(avg(coalesce(p.f0, 0.0::REAL)::DOUBLE), 4) AS avg_f0
      |FROM m LEFT JOIN perdoc p ON p.doc_id = m.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_stats" -> (mm1MediaStats _),
    "mm2_frame_sample" -> (mm2FrameSample _),
    "mm3_decode_features" -> (mm3DecodeFeatures _),
    "mm4_audio_windows" -> (mm4AudioWindows _),
    "mm5_phash_neardup" -> (mm5PhashNearDup _),
  )

  def oracleSql: Map[String, String] = Map(
    "mm1_media_stats" -> mm1MediaStatsSql,
    "mm2_frame_sample" -> mm2FrameSampleSql,
    "mm3_decode_features" -> mm3DecodeFeaturesSql,
    "mm4_audio_windows" -> mm4AudioWindowsSql,
    "mm5_phash_neardup" -> mm5PhashNearDupSql,
  )
}
