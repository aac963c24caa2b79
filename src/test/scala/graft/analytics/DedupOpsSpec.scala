package graft.analytics

import org.apache.spark.sql.Row

import graft.SparkSuite
import graft.core.Tables

/** N1/N2/N2b/N4 dedup semantics on sf0.001 documents (500 rows). */
class DedupOpsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("n1 exact dedup partitions the corpus: sum(n_copies) == total docs") {
    val total = Tables.documents(spark, dir).count()
    val dedup = DedupOps.n1DedupExact(spark, dir)
    val agg = dedup.selectExpr("sum(n_copies)", "count(*)").head()
    assert(agg.getLong(0) == total)
    assert(agg.getLong(1) <= total)
  }

  test("n1 keep_id is the minimum doc_id of its duplicate group") {
    val docs = Tables.documents(spark, dir)
    val dedup = DedupOps.n1DedupExact(spark, dir)
    // every keep_id must be a real doc_id
    val orphan = dedup.join(docs, dedup("keep_id") === docs("doc_id"), "left_anti")
    assert(orphan.count() == 0)
  }

  test("n2 exact jaccard pairs are symmetric-free, thresholded, ordered") {
    val pairs = DedupOps.n2NgramJaccard(spark, dir).collect()
    pairs.foreach { case Row(da: Long, db: Long, j: Double) =>
      assert(da < db, s"pair ($da,$db) not canonical")
      assert(j >= 0.8 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("n2b MinHash+LSH finds the same pairs as exact n2 (verified candidates)") {
    val exact = DedupOps.n2NgramJaccard(spark, dir).collect().toSet
    val lsh = DedupOps.n2bMinhashLsh(spark, dir).collect().toSet
    // LSH verifies candidates with the same exact-jaccard filter, so it can
    // only MISS pairs (banding false negatives), never add them.
    assert(lsh.subsetOf(exact), s"LSH emitted non-exact pairs: ${lsh -- exact}")
    val recall =
      if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall $recall below 0.95 (${lsh.size}/${exact.size})")
  }

  test("n2c incremental near-dup == full n2 recompute restricted to " +
      "pairs touching the batch (VERDICT r13 #6)") {
    val pairs = DedupOps.n2cNeardupIncremental(spark, dir).collect()
      .map { case Row(da: Long, db: Long, j: Double) => (da, db, j) }.toSet
    // the reference answer: the FULL exact pair set, filtered to
    // pairs with >= 1 side in the day-two batch (doc_id % 3 == 0)
    val full = DedupOps.n2NgramJaccard(spark, dir).collect()
      .map { case Row(da: Long, db: Long, j: Double) => (da, db, j) }
      .filter { case (da, db, _) => da % 3 == 0 || db % 3 == 0 }.toSet
    assert(pairs == full,
      s"incremental missed ${(full -- pairs).take(3)} / " +
        s"invented ${(pairs -- full).take(3)}")
    assert(pairs.nonEmpty, "vacuous: no near-dup pair touches the batch")
    // and it finds NOTHING among published survivors: every reported
    // pair touches the batch
    assert(pairs.forall { case (da, db, _) => da % 3 == 0 || db % 3 == 0 })
  }

  test("n4 simhash: one fingerprint per doc; exact duplicates collide") {
    val fp = DedupOps.n4Simhash(spark, dir)
    val docs = Tables.documents(spark, dir).count()
    assert(fp.count() == docs)
    // exact-duplicate texts (n1 groups with n_copies > 1) must share simhash
    val dup = DedupOps.n1DedupExact(spark, dir).filter("n_copies > 1")
    if (dup.count() > 0) {
      val d = Tables.documents(spark, dir)
        .join(fp, "doc_id")
        .groupBy("text").agg(
          org.apache.spark.sql.functions.countDistinct("simhash").as("nfp"))
      assert(d.filter("nfp > 1").count() == 0)
    }
  }

  test("simhashPairs finds near-identical fingerprints within hamming budget") {
    val fp = DedupOps.n4Simhash(spark, dir)
    val pairs = DedupOps.simhashPairs(fp, maxHamming = 3).collect()
    pairs.foreach { case Row(da: Long, db: Long, h: Long) =>
      assert(da < db); assert(h <= 3)
    }
  }

  test("n6 decontamination: only train docs sharing a verbatim 8-gram flag") {
    import spark.implicits._
    val passage = "one two three four five six seven eight"  // exactly 8 words
    val docs = Seq(
      (10L, s"eval prefix $passage eval suffix words here"), // eval (10 % 10 == 0)
      (1L,  s"train doc copies $passage and continues on"),  // contaminated
      (2L,  "completely different words with no overlap at all in this document"),
      (3L,  s"another borrower of $passage in the middle"),  // contaminated
    ).toDF("doc_id", "text")
    val out = DedupOps.n6DecontaminateOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == Set(1L, 3L), out.mkString(","))
    // each shares exactly the one embedded 8-gram with exactly one eval doc
    out.foreach { case (_, nGrams, nEval) =>
      assert(nGrams == 1L && nEval == 1L)
    }
  }

  test("n6 on testdata: deterministic, nonempty, eval docs never flagged") {
    val rows = DedupOps.n6Decontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % DedupOps.DecontamEvalMod != 0,
        s"eval doc ${r.getLong(0)} in the train-side output")
    }
    assert(DedupOps.n6Decontaminate(spark, dir).collect().toSeq == rows.toSeq)
  }

  test("n9 survivor selection: one rep per cluster, longest text wins") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val labels = ClusterOps.connectedComponents(
      DedupOps.n2PairsShared(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = DedupOps.n9ClusterKeep(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    // every unclustered doc survives; every cluster keeps exactly one
    assert((all -- labels.keySet).subsetOf(kept))
    val byCluster = labels.groupBy(_._2)
    byCluster.foreach { case (_, members) =>
      assert(members.keys.count(kept) == 1)
    }
    // the survivor is the longest member (ties by lowest doc_id)
    val nchars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (_, members) =>
      val winner = members.keys.toSeq.sortBy(id => (-nchars(id), id)).head
      assert(kept(winner), s"expected $winner kept among ${members.keys}")
    }
    // survivors keep their source attributes verbatim
    assert(DedupOps.n9ClusterKeep(spark, dir).columns.toSeq ==
      Seq("doc_id", "lang", "n_chars"))
  }

  test("n10 span dup fraction: exact duplicates score 10000 basis points") {
    import org.apache.spark.sql.functions._
    val out = DedupOps.n10SpanDupfrac(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, n, dup, bp) =>
      assert(dup <= n && bp == dup * 10000 / n)
    }
    // exact duplicates share every shingle (10000 bp); a doc with no
    // cross-document shingle overlap scores 0
    import spark.implicits._
    val synth = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val bp = DedupOps.n10SpanDupfracOn(synth)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bp == Map(1L -> 10000L, 2L -> 10000L, 3L -> 0L))
  }

  test("n1b incremental dedup: batch-only ids, unique new fingerprints") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val split = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
      .head().getLong(0)
    val out = DedupOps.n1bDedupIncremental(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) >= split), "existing-corpus id leaked into batch output")
    val fps = out.map(_.getString(1))
    assert(fps.distinct.length == fps.length, "duplicate fingerprint landed twice")
    // nothing already published re-lands: intersect with existing fingerprints is empty
    val existing = docs.filter(col("doc_id") < split)
      .select(md5(col("text").cast("binary"))).collect().map(_.getString(0)).toSet
    assert(fps.forall(!existing.contains(_)))
  }

  test("n11 dup spans: hand-corpus anchors merge within 3, split past it, " +
      "and the MinSpanWords bar binds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // d1/d2 share the 5-word prefix "a b c d e" (anchors 0,1,2 -> one
    // span [0,4]); d5 repeats that prefix at positions 0 and 9 with a
    // 4-word unique gap between anchor runs (gap 9-2=7 > 3 -> SPLIT
    // into two 5-word spans); every other shingle is document-unique
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e z1 z2 z3"),
      (5L, "a b c d e q1 q2 q3 q4 a b c d e"),
    ).toDF("doc_id", "text")
    val got = DedupOps.n11DupSpansOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got == List(
      (1L, 0L, 4L, 5L),
      (2L, 0L, 4L, 5L),
      (5L, 0L, 4L, 5L),
      (5L, 9L, 13L, 5L)))
  }

  test("n12 span scrub: hand-corpus — spans deleted in place, no-span " +
      "docs pass through verbatim, a fully-duplicated doc empties") {
    import spark.implicits._
    // same staging as the n11 hand corpus: d1/d2 share the "a b c d e"
    // prefix (span [0,4] each), d5 carries it twice ([0,4] and [9,13] —
    // removing both leaves exactly the 4-word unique gap), d9 is
    // span-free and must come back byte-identical, d10 IS d1's first
    // five words verbatim (one span covering the whole doc -> empty)
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e z1 z2 z3"),
      (5L, "a b c d e q1 q2 q3 q4 a b c d e"),
      (9L, "only unique words live here"),
      (10L, "a b c d e"),
    ).toDF("doc_id", "text")
    val got = DedupOps.n12SpanScrubOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toList
    assert(got == List(
      (1L, 8L, 3L, "f g h"),
      (2L, 8L, 3L, "z1 z2 z3"),
      (5L, 14L, 4L, "q1 q2 q3 q4"),
      (9L, 5L, 5L, "only unique words live here"),
      (10L, 5L, 0L, "")))
  }

  test("n12 on testdata: removed word counts equal n11's span coverage " +
      "exactly, and clean text is a subsequence of the original") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val scrub = DedupOps.n12SpanScrubOn(docs).cache()
    try {
      assert(scrub.count() == docs.count())
      // spans are disjoint per doc (islands merge overlaps), so the
      // words removed are EXACTLY the summed span widths
      val cover = DedupOps.n11DupSpansOn(docs)
        .groupBy(col("doc_id"))
        .agg(sum(col("span_words")).as("covered"))
      val bad = scrub.join(cover, Seq("doc_id"), "left")
        .withColumn("covered", coalesce(col("covered"), lit(0L)))
        .filter(col("n_words") - col("kept_words") =!= col("covered"))
      assert(bad.count() == 0,
        s"removal != coverage: ${bad.take(3).mkString(", ")}")
      assert(scrub.filter(col("kept_words") > col("n_words")).count() == 0)
      // a doc that lost nothing must come back byte-identical
      assert(scrub
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .filter(col("kept_words") === col("n_words") &&
          col("clean_text") =!= col("text"))
        .count() == 0)
    } finally { scrub.unpersist(); () }
  }

  test("n11 on testdata: spans are in-bounds, disjoint, >= MinSpanWords, " +
      "and every span doc really has duplicated shingles (n10 agrees)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val spans = DedupOps.n11DupSpansOn(docs).cache()
    try {
      assert(spans.filter(col("span_words") < DedupOps.MinSpanWords)
        .count() == 0)
      assert(spans.filter(col("span_words") !==
        col("span_end") - col("span_start") + 1).count() == 0)
      // span_end stays inside the document's word count
      val oob = spans.join(docs.select(col("doc_id"),
          (size(split(col("text"), " ")) - 1).as("last_word")),
        Seq("doc_id"))
        .filter(col("span_start") < 0 || col("span_end") > col("last_word"))
      assert(oob.count() == 0)
      // islands are disjoint and strictly ordered within a doc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("span_start"))
      val overlapping = spans
        .withColumn("prev_end", lag(col("span_end"), 1).over(w))
        .filter(col("prev_end").isNotNull &&
          col("span_start") <= col("prev_end"))
      assert(overlapping.count() == 0)
      // cross-check against n10: a doc carrying a span has dup
      // shingles there (dup_bp > 0)
      val n10 = DedupOps.n10SpanDupfracOn(docs)
      val contradicted = spans.select(col("doc_id")).distinct()
        .join(n10.filter(col("dup_bp") === 0L), Seq("doc_id"))
      assert(contradicted.count() == 0)
      assert(spans.count() > 0)
    } finally { spans.unpersist(); () }
  }

  test("sortedIntersectCount == size(array_intersect) on signature arrays " +
      "(the r15 verification kernel swap)") {
    import org.apache.spark.sql.functions._
    // the real shape: every signature pair of the sf corpus (capped),
    // plus adversarial edges (empty arrays, disjoint, identical, null)
    val sigs = DedupOps.shingleSets(Tables.documents(spark, dir)).limit(80)
    val pairs = sigs.toDF("da", "set_a", "na")
      .crossJoin(sigs.toDF("db", "set_b", "nb"))
      .filter(col("da") < col("db"))
    val diff = pairs.withColumn("fast",
        graft.functions.VectorFunctions
          .sortedIntersectCount(col("set_a"), col("set_b")))
      .withColumn("ref", size(array_intersect(col("set_a"), col("set_b"))))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L,2L,3L), array(1L,2L,3L), 3),
        |  (array(1L,2L,3L), array(4L,5L), 0),
        |  (array(), array(1L), 0),
        |  (CAST(null AS array<bigint>), array(1L), -1),
        |  (array(1L,5L,9L), array(0L,5L,9L,11L), 2)
        |AS t(a, b, want)""".stripMargin)
      .withColumn("got", coalesce(graft.functions.VectorFunctions
        .sortedIntersectCount(col("a"), col("b")), lit(-1)))
      .filter(col("got") =!= col("want"))
    assert(edge.count() == 0)
  }

  test("minHashBank == the 32 min(xxhash64(i, h)) aggregates it replaced " +
      "(the r16 signature kernel swap)") {
    import org.apache.spark.sql.functions._
    val sh = DedupOps.shingleHashes(Tables.documents(spark, dir))
    // the OLD formulation: 32 fused min+hash aggregates over the raw
    // (duplicated) shingle stream
    val mins = (0 until DedupOps.MinhashPerms).map(i =>
      min(xxhash64(lit(i), col("h"))).as(s"ref$i"))
    val ref = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val got = DedupOps.minhashSignatures(Tables.documents(spark, dir))
      .select(col("doc_id"), col("mh"))
    val joined = got.join(ref, Seq("doc_id"))
    assert(joined.count() == ref.count())
    val bad = (0 until DedupOps.MinhashPerms)
      .map(i => element_at(col("mh"), i + 1) =!= col(s"ref$i"))
      .reduce(_ || _)
    assert(joined.filter(bad).count() == 0)
  }

  test("ppjoinCandidatePairs == HOF expansion + length/position filters " +
      "(the r16 candidate kernel swap)") {
    import org.apache.spark.sql.functions._
    // real posting groups of the sf corpus (uncapped — the kernel must
    // agree on every group shape the pipeline can see)
    val sigs = DedupOps.shingleSets(Tables.documents(spark, dir))
    val theta = DedupOps.JaccardThreshold
    val groups = sigs.select(col("doc_id"), col("n"),
        posexplode(slice(col("hs"), lit(1),
          (col("n") - ceil(col("n") * theta) + 1).cast("int")))
          .as(Seq("pos", "ph")))
      .groupBy(col("ph"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("n"), col("pos")))).as("ids"))
      .filter(size(col("ids")) > 1)
    val ref = groups
      .select(explode(flatten(transform(col("ids"),
        (x, i) => transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.getField("doc_id").as("da"), x.getField("n").as("na"),
            x.getField("pos").as("pa"),
            y.getField("doc_id").as("db"), y.getField("n").as("nb"),
            y.getField("pos").as("pb")))))).as("p"))
      .filter(least(col("p.na"), col("p.nb")) * 5 >=
        greatest(col("p.na"), col("p.nb")) * 4)
      .filter((least(col("p.pa"), col("p.pb")) + lit(1) +
        least(col("p.na") - col("p.pa") - lit(1),
          col("p.nb") - col("p.pb") - lit(1))) * lit(9) >=
        (col("p.na") + col("p.nb")) * lit(4))
      .select(col("p.da").as("da"), col("p.db").as("db"))
    val got = groups.select(explode(graft.functions.VectorFunctions
        .ppjoinCandidatePairs(col("ids"))).as("p"))
      .select(col("p.da").as("da"), col("p.db").as("db"))
    // MULTISET equality: same (da, db, multiplicity) triples, same total
    val refC = ref.groupBy(col("da"), col("db")).count()
    val gotC = got.groupBy(col("da"), col("db")).count()
    assert(refC.except(gotC).count() == 0 && gotC.except(refC).count() == 0)
    assert(got.count() == ref.count())
    assert(got.count() > 0) // the corpus must actually exercise the kernel
  }

  test("ngramHashStream == the window/lead + concat_ws formulation it " +
      "replaced, n=3 and n=8 (the r16 map-side n-gram swap)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    for (n <- Seq(3, DedupOps.DecontamN)) {
      // the OLD formulation: posexplode + (doc,pos) window with leads
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val leads = (1 until n).map(i => lead(col("w"), i).over(w).as(s"w$i"))
      val allWords = col("w") +: (1 until n).map(i => col(s"w$i"))
      val ref = docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .select(col("doc_id") +: col("w") +: leads: _*)
        .filter(col(s"w${n - 1}").isNotNull)
        .select(col("doc_id"), xxhash64(concat_ws(" ", allWords: _*)).as("h"))
      val got = DedupOps.ngramHashes(docs, n)
      // MULTISET equality per doc (raw stream repeats repeated n-grams)
      val refC = ref.groupBy(col("doc_id"), col("h")).count()
      val gotC = got.groupBy(col("doc_id"), col("h")).count()
      assert(refC.except(gotC).count() == 0 && gotC.except(refC).count() == 0,
        s"n=$n multiset mismatch")
      assert(got.count() == ref.count(), s"n=$n count mismatch")
      assert(got.count() > 0, s"n=$n kernel not exercised")
    }
  }

  test("bigramHashes == hashing the window/lead wordPairs formulation " +
      "(the r16 t8 stream swap)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val ref = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), xxhash64(col("w1")).as("h1"),
        xxhash64(col("w1"), col("w2")).as("h12"))
    val got = DedupOps.bigramHashes(docs)
    val refC = ref.groupBy(col("doc_id"), col("h1"), col("h12")).count()
    val gotC = got.groupBy(col("doc_id"), col("h1"), col("h12")).count()
    assert(refC.except(gotC).count() == 0 && gotC.except(refC).count() == 0)
    assert(got.count() == ref.count())
    assert(got.count() > 0)
  }

  test("orderedPairs == HOF all-pairs expansion on LSH bucket arrays") {
    import org.apache.spark.sql.functions._
    val sig = DedupOps.minhashSignatures(Tables.documents(spark, dir))
    val bandCols = (0 until DedupOps.LshBands).map { b =>
      xxhash64((Seq(lit(b)) ++ (0 until 4).map(r =>
        element_at(col("mh"), b * 4 + r + 1))): _*)
    }
    val buckets = sig.select(col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val ref = buckets.select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("da"), y.as("db")))))).as("p"))
      .select(col("p.da").as("da"), col("p.db").as("db"))
    val got = buckets.select(explode(graft.functions.VectorFunctions
        .orderedPairs(col("ids"))).as("p"))
      .select(col("p.da").as("da"), col("p.db").as("db"))
    assert(got.count() == ref.count())
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0)
    assert(got.count() > 0)
  }
}
