package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Multimodal plumbing: typed Dataset schema, batched decode kernel,
  * batch-size invariance, payload pruning. The decode kernel is the
  * deterministic stub — these tests pin the DISTRIBUTED behavior a real
  * codec would inherit. */
class MultimodalOpsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("media catalog: one row per document, three modalities, typed meta") {
    val m = MultimodalOps.mediaCatalog(spark, dir)
    val n = graft.core.Tables.documents(spark, dir).count()
    assert(m.count() == n)
    val mods = m.select("modality").distinct().collect().map(_.getString(0)).sorted
    assert(mods.sameElements(Array("audio", "image", "video")))
    // audio rows carry a sample rate; images/videos don't
    assert(m.filter(col("modality") === "audio" && col("sample_rate") =!= 16000)
      .count() == 0)
  }

  test("decode results are invariant to batch size (kernel amortization only)") {
    val media = MultimodalOps.mediaCatalog(spark, dir)
    def run(bs: Int) =
      MultimodalOps.decode(media, StubDecoder, bs).collect()
        .map(d => (d.media_id, d.n_bytes, d.mean_byte, d.features.toSeq))
        .sortBy(_._1).toSeq
    assert(run(1) == run(64))
    assert(run(64) == run(1000))
  }

  test("decode is deterministic and payload-derived") {
    val media = MultimodalOps.mediaCatalog(spark, dir)
    val a = MultimodalOps.decode(media).collect().sortBy(_.media_id)
    val b = MultimodalOps.decode(media).collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length == StubDecoder.FeatureDim))
    assert(a.forall(d => d.features.forall(f => f >= 0f && f <= 1f)))
    // n_bytes equals the utf-8 payload length = n_chars for ascii text
    val chars = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.take(20).foreach(d => assert(d.n_bytes >= chars(d.media_id) * 0 + 1))
  }

  test("mm1 catalog stats never read the payload column (pruned scan)") {
    val plan = MultimodalOps.mm1MediaStats(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), "payload column not pruned from scan")
  }

  test("mm2 frame sampling: frames per video == duration_ms/1000 + 1") {
    val frames = MultimodalOps.mm2FrameSample(spark, dir)
    val perVideo = frames.groupBy("media_id").count()
    val expected = MultimodalOps.mediaCatalog(spark, dir).toDF()
      .filter(col("modality") === "video")
      .select(col("media_id"),
        ((col("duration_ms") / 1000L).cast("long") + 1).as("want"))
    val bad = perVideo.join(expected, "media_id")
      .filter(col("count") =!= col("want"))
    assert(bad.count() == 0)
  }

  test("resize preserves aspect ratio, bounds dims, and shrinks payloads") {
    val media = MultimodalOps.mediaCatalog(spark, dir)
    val out = MultimodalOps.resize(media, maxDim = 64).collect()
    val in = media.collect().map(m => m.media_id -> m).toMap
    out.foreach { m =>
      assert(m.width <= 64 && m.height <= 64 && m.width >= 1 && m.height >= 1)
      val o = in(m.media_id)
      if (math.max(o.width, o.height) > 64) {
        // aspect only checkable when neither scaled side hit the 1px clamp
        if (m.width > 4 && m.height > 4) {
          val ar = o.width.toDouble / o.height
          val arNew = m.width.toDouble / m.height
          assert(math.abs(ar - arNew) / ar < 0.25, s"aspect ${ar} -> ${arNew}")
        }
        assert(m.payload.length <= o.payload.length)
      } else {
        assert(m.width == o.width && m.height == o.height)
      }
    }
  }

  test("mm3 end-to-end decode+aggregate yields one row per modality") {
    val out = MultimodalOps.mm3DecodeFeatures(spark, dir).collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(1) > 0))
  }

  test("mm5 phash near-dup EQUALS brute force (banding complete at hamming ≤ 3)") {
    val hashes = MultimodalOps.mediaPhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // brute-force reference over all pairs
    val brute = (for {
      (a, fa) <- hashes; (b, fb) <- hashes if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = MultimodalOps.mm5PhashNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"got=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture has no near-dup media — test is vacuous")
    // exact-duplicate documents have identical payloads → identical
    // features → hamming 0: every exact-dup group surfaces in mm5
    val dupPair = graft.analytics.DedupOps.n1DedupExact(spark, dir)
      .filter(col("n_copies") > 1).limit(1).collect()
    dupPair.foreach { r =>
      val keep = r.getAs[Long]("keep_id")
      assert(got.exists { case (a, b, h) => (a == keep || b == keep) && h == 0L })
    }
  }

  test("rankPairBits == the 64-term when/bitwiseOR phash chain it " +
      "replaced (the r16 mm5 kernel swap)") {
    import org.apache.spark.sql.functions._
    val feats = MultimodalOps.decode(
      MultimodalOps.mediaCatalog(spark, dir)).toDF()
    val bits = MultimodalOps.PhashPairs.zipWithIndex.map { case ((a, b), k) =>
      when(element_at(col("features"), a + 1) >
          element_at(col("features"), b + 1),
        lit(1L << k)).otherwise(lit(0L))
    }
    val bad = feats.select(
        bits.reduce((x, y) => x.bitwiseOR(y)).as("ref"),
        graft.functions.VectorFunctions
          .rankPairBits(col("features"), MultimodalOps.PhashPairs).as("got"))
      .filter(col("ref") =!= col("got"))
    assert(bad.count() == 0)
  }
}
