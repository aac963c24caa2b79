package graft.analytics

import org.apache.spark.sql.Row

import graft.SparkSuite

/** N3 similarity search on sf0.001 embeddings (500 unit vectors).
  * The synthetic vectors are i.i.d. random (no cluster structure —
  * within-label avg cosine ≈ 0), so ANN recall is the hard case here:
  * SRP-LSH must still beat random candidate selection by a wide margin.
  */
class SimilarityOpsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("n3 brute force: 10 ranked neighbors per query, sims in [-1,1] descending") {
    val rows = SimilarityOps.n3CosineTopk(spark, dir).collect()
    assert(rows.length == SimilarityOps.QueryCount * SimilarityOps.TopK)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val sims = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    }
  }

  test("n3 self-similarity excluded and neighbors are real vec_ids") {
    val rows = SimilarityOps.n3CosineTopk(spark, dir).collect()
    rows.foreach { case Row(qid: Long, _, nbr: Long, _) => assert(qid != nbr) }
  }

  test("n3b SRP-LSH: exact sims, recall above chance at sf0.001 AND sf0.1") {
    for ((d, minRecall) <- Seq("/root/testdata/sf0.001" -> 0.2,
                               "/root/testdata/sf0.1" -> 0.1)) {
      val exact = SimilarityOps.n3CosineTopk(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
      val ann = SimilarityOps.n3bSrpAnn(spark, d).collect()

      // every ANN sim must equal the exact sim for that pair (verification
      // is exact; only candidate generation is approximate)
      ann.foreach { case Row(qid: Long, _, nbr: Long, sim: Double) =>
        exact.get((qid, nbr)).foreach(es => assert(es == sim, s"$d ($qid,$nbr)"))
      }

      val hit = ann.count { case Row(q: Long, _, n: Long, _) => exact.contains((q, n)) }
      val recall = hit.toDouble / exact.size

      // On i.i.d. random vectors any LSH recall is bounded by how many
      // candidates it inspects, so the meaningful score is the LIFT over
      // random candidate sampling: recall / (candidate fraction).
      val corpus = graft.core.Tables.embeddings(spark, d).count()
      val bits = SimilarityOps.srpBitsFor(corpus)
      val all = graft.core.Tables.embeddings(spark, d)
        .selectExpr("vec_id", "cast(embedding as array<double>) as v",
          "cast(1.0 as double) as nrm")
      val nCand = SimilarityOps.srpCandidates(all, bits).count()
      val candFrac = nCand.toDouble / (SimilarityOps.QueryCount * (corpus - 1))
      val lift = recall / candFrac
      info(f"$d: bits=$bits recall@10 = $recall%.3f ($hit/${exact.size}), " +
        f"candidate fraction = $candFrac%.3f, lift = $lift%.1f×")
      assert(recall >= minRecall, f"$d recall $recall%.3f collapsed")
      assert(candFrac <= 0.25, f"$d candidate fraction $candFrac%.3f too high — not ANN")
      assert(lift >= 2.0, f"$d lift $lift%.1f: no better than random sampling")
    }
  }

  test("srpBitsFor targets constant occupancy, monotone in n, clamped") {
    assert(SimilarityOps.srpBitsFor(500) == 6)   // sf0.001 ≡ round-1 bits
    assert(SimilarityOps.srpBitsFor(2000) == 8)  // sf0.1 grows
    assert(SimilarityOps.srpBitsFor(1) == SimilarityOps.SrpMinBits)
    assert(SimilarityOps.srpBitsFor(1L << 40) == SimilarityOps.SrpMaxBits)
    for (n <- Seq(100L, 10000L, 1000000L, 100000000L)) {
      val bits = SimilarityOps.srpBitsFor(n)
      assert(n.toDouble / (1L << bits) <= SimilarityOps.SrpTargetOccupancy,
        s"n=$n bits=$bits: expected occupancy above target")
    }
  }

  test("SRP occupancy stays bounded as the corpus grows (adaptive bits + cap)") {
    def occStats(d: String): (Long, Int, Long, Double) = {
      val e = graft.core.Tables.embeddings(spark, d)
        .selectExpr("vec_id", "cast(embedding as array<double>) as v",
          "cast(1.0 as double) as nrm")
      val n = e.count()
      val bits = SimilarityOps.srpBitsFor(n)
      val occ = SimilarityOps.capBuckets(SimilarityOps.srpBuckets(e, bits))
        .groupBy("table", "bucket").count()
      val r = occ.agg(org.apache.spark.sql.functions.max("count"),
        org.apache.spark.sql.functions.avg("count")).head
      (n, bits, r.getLong(0), r.getDouble(1))
    }
    val (n1, b1, m1, a1) = occStats("/root/testdata/sf0.001")
    val (n2, b2, m2, a2) = occStats("/root/testdata/sf0.1")
    info(f"sf0.001: n=$n1 bits=$b1 maxOcc=$m1 avgOcc=$a1%.1f; " +
      f"sf0.1: n=$n2 bits=$b2 maxOcc=$m2 avgOcc=$a2%.1f")
    assert(n2 > n1 && b2 > b1, "bits must grow with the corpus")
    assert(m1 <= SimilarityOps.SrpBucketCap && m2 <= SimilarityOps.SrpBucketCap)
    // mean occupancy tracks the target at BOTH scales instead of n/2^const
    assert(a1 <= 2.0 * SimilarityOps.SrpTargetOccupancy)
    assert(a2 <= 2.0 * SimilarityOps.SrpTargetOccupancy)
  }

  test("multi-probe expands to exact bucket + every 1-bit flip (wide-bits path)") {
    import spark.implicits._
    val bits = 12
    assert(bits >= SimilarityOps.SrpMultiProbeMinBits)
    val side = Seq((1L, 0, 5L)).toDF("vec_id", "table", "bucket")
    val probed = SimilarityOps.withProbes(side, bits).collect()
    assert(probed.length == bits + 1)
    val bks = probed.map(_.getLong(2)).toSet
    assert(bks == (Set(5L) ++ (0 until bits).map(j => 5L ^ (1L << j))))
    // below the threshold multi-probe is a no-op
    assert(SimilarityOps.withProbes(side, 8).collect().toSeq ==
      side.collect().toSeq)
  }

  test("bucket cap keeps the lowest vec_ids deterministically") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, 0, 7L)).toDF("vec_id", "table", "bucket")
      .repartition(4) // layout-independent winner
    val kept = SimilarityOps.capBuckets(rows).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == (1L to SimilarityOps.SrpBucketCap))
  }

  test("wide-code regime end-to-end: 20k corpus drives multi-probe, " +
      "occupancy stays bounded, candidates beat random") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic synthetic corpus large enough to cross the
    // multi-probe threshold (testdata tops out at bits=8)
    val n = 20000
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(n) { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()).toSeq)
    }
    val all = vecs.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val bits = SimilarityOps.srpBitsFor(n)
    assert(bits >= SimilarityOps.SrpMultiProbeMinBits,
      s"bits=$bits: corpus must exercise the multi-probe path")

    // occupancy bounded at wide codes too
    val occ = SimilarityOps.capBuckets(SimilarityOps.srpBuckets(all, bits))
      .groupBy("table", "bucket").count()
    val occRow = occ.agg(max("count"), avg("count")).head
    assert(occRow.getLong(0) <= SimilarityOps.SrpBucketCap)
    assert(occRow.getDouble(1) <= 2.0 * SimilarityOps.SrpTargetOccupancy)

    // candidate-level recall vs exact top-10, for 8 query vectors
    val nQ = 8
    val cand = SimilarityOps.srpCandidates(all, bits)
      .filter(col("qid") < nQ).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candFrac = cand.size.toDouble / (nQ.toLong * (n - 1))
    assert(candFrac <= 0.1, f"candFrac $candFrac%.4f: not ANN")

    val q = all.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val sims = all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        (graft.functions.VectorFunctions.dot(col("qv"), col("v")) /
          (col("qn") * col("nrm"))).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("nbr"))
    val exact = sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10).select("qid", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val hit = exact.count(cand.contains)
    val recall = hit.toDouble / exact.size
    val lift = recall / candFrac
    info(f"bits=$bits candFrac=$candFrac%.4f candRecall=$recall%.3f lift=$lift%.1f×")
    assert(lift >= 2.0, f"lift $lift%.1f: multi-probe no better than random")
  }

  test("n5 embed near-dup: sims exact, thresholded, pairs canonical") {
    import org.apache.spark.sql.functions._
    val rows = SimilarityOps.n5EmbedNearDup(spark, dir).collect()
    rows.foreach { case Row(va: Long, vb: Long, s: Double) =>
      assert(va < vb && s >= SimilarityOps.NearDupThreshold && s <= 1.0)
    }
    // every emitted pair's sim must equal the brute-force cosine
    val e = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byId = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.take(50).foreach { case Row(va: Long, vb: Long, s: Double) =>
      assert(math.abs(cosine(byId(va), byId(vb)) - s) <= 1e-4, s"($va,$vb)")
    }
  }

  test("n3g filtered top-k: exact, label-constrained, queries unfiltered") {
    val rows = SimilarityOps.n3gFilteredTopk(spark, dir).collect()
    // every query emits a full top-10 (label slice ≫ 10 vectors), every
    // neighbor passes the predicate, no self-matches
    assert(rows.length == SimilarityOps.QueryCount * SimilarityOps.TopK)
    val labelOf = graft.core.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case Row(qid: Long, _, nbr: Long, _) =>
      assert(nbr != qid)
      assert(labelOf(nbr) == SimilarityOps.FilterLabel, s"nbr $nbr")
    }
    // sims agree with the unfiltered exact ranking wherever they overlap
    val exact = SimilarityOps.n3CosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rows.foreach { case Row(qid: Long, _, nbr: Long, sim: Double) =>
      exact.get((qid, nbr)).foreach(es => assert(es == sim))
    }
  }

  test("n3h filtered IVF: sims exact, recall ≥ chance lift, all labeled") {
    val exact = SimilarityOps.n3gFilteredTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val rows = SimilarityOps.n3hFilteredIvf(spark, dir).collect()
    val labelOf = graft.core.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case Row(qid: Long, _, nbr: Long, sim: Double) =>
      assert(nbr != qid)
      assert(labelOf(nbr) == SimilarityOps.FilterLabel)
      // every emitted sim is the true cosine (probing is the only
      // approximation — filtered exact ranking must agree on overlap)
      exact.get((qid, nbr)).foreach(es => assert(es == sim))
    }
    val hit = rows.count { case Row(q: Long, _, n: Long, _) =>
      exact.contains((q, n)) }
    val recall = hit.toDouble / exact.size
    // same probe machinery as n3c: the filter must not collapse recall
    // below what random candidate sampling at the probed fraction gives
    val probed = SimilarityOps.IvfProbes.toDouble /
      SimilarityOps.ivfCellsFor(
        graft.core.Tables.embeddings(spark, dir).count())
    info(f"filtered recall@10 = $recall%.3f (probed fraction ≈ $probed%.3f)")
    assert(recall >= probed, f"recall $recall%.3f below chance $probed%.3f")
  }

  test("n3f IVF-PQ: recall holds n3c's level, sims exact, pruned code " +
      "scan, ~32x payload cut") {
    val exact = SimilarityOps.n3CosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    def recallOf(rows: Array[Row]): Double =
      rows.count { case Row(q: Long, _, n: Long, _) =>
        exact.contains((q, n))
      }.toDouble / exact.size
    val pq = SimilarityOps.n3fIvfPqAnn(spark, dir)
    val pqRows = pq.collect()
    // emitted sims are EXACT (the refine tier re-scores from full
    // vectors; only candidate generation + shortlist are approximate)
    pqRows.foreach { case Row(qid: Long, _, nbr: Long, sim: Double) =>
      exact.get((qid, nbr)).foreach(es => assert(es == sim, s"($qid,$nbr)"))
    }
    val rC = recallOf(SimilarityOps.n3cIvfAnn(spark, dir).collect())
    val rPq = recallOf(pqRows)
    info(f"recall@10: n3c=$rC%.3f  n3f(ivf-pq)=$rPq%.3f")
    // same probed cells + ADC shortlist deep enough → the PQ tier must
    // not lose recall vs the flat tier it compresses
    assert(rPq >= rC - 1e-9, f"PQ recall $rPq%.3f fell below n3c $rC%.3f")
    // the candidate scan reads the cell-partitioned CODE store pruned
    // to the probed cells (PartitionFilters, not a post-scan filter)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case o => o.children.flatMap(scans) ++ o.subqueries.flatMap(scans)
    }
    val codeScans = scans(pq.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("pq_codes")))
    assert(codeScans.nonEmpty, "pq_codes scan missing from the n3f plan")
    codeScans.foreach { s =>
      assert(s.partitionFilters.mkString(",").contains("cell"),
        s"unpruned code scan: ${s.partitionFilters.mkString(",")}")
    }
    // codes are M 8-bit entries; per-ROW payload of the code table is
    // a large factor below the full-vector index (8 B codes + norm vs
    // 64 float64s — ~32x logical vs float32 storage; measured on
    // parquet bytes, conservatively ≥ 6x)
    val root = SimilarityOps.publishedPqRoot(spark, dir)
    import graft.ops.{AtomicPublish, Compaction}
    val codesDf = AtomicPublish.readTable(spark, root, "pq_codes")
    assert(codesDf.selectExpr("size(codes)").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(SimilarityOps.PqM))
    // payload ratio on single-file writes (the 23-cell partitioned toy
    // store is footer-overhead-dominated at ~20 rows/file; one file per
    // side isolates the real per-row encoding the 100 TB regime sees)
    def fileBytes(df: org.apache.spark.sql.DataFrame): Long = {
      val p = java.nio.file.Files.createTempDirectory("pq-payload")
      val out = p.resolve("t").toString
      df.coalesce(1).write.parquet(out)
      val b = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile); b
    }
    val pqBytes = fileBytes(codesDf.select("vec_id", "codes", "pnorm2"))
    val ivfRoot = SimilarityOps.publishedIndexRoot(spark, dir)
    val full = AtomicPublish.readTable(spark, ivfRoot, "ivf_index")
    val ivfBytes = fileBytes(full.select("vec_id", "v", "nrm"))
    val pqRowsN = codesDf.count(); val ivfRowsN = full.count()
    val ratio = (ivfBytes.toDouble / ivfRowsN) / (pqBytes.toDouble / pqRowsN)
    info(f"per-row payload: full vectors ${ivfBytes / ivfRowsN} B, " +
      f"pq codes ${pqBytes / pqRowsN} B → ${ratio}%.1fx")
    assert(ratio >= 12.0, f"payload ratio $ratio%.1fx — PQ tier not paying off")
  }

  test("pqAdcDot == the posexplode ⋈ broadcast(qdot) → sum formulation " +
      "it replaced (bit-exact, the r16 ADC kernel swap)") {
    import org.apache.spark.sql.functions._
    val all = SimilarityOps.corpus(spark, dir)
    val queries = all.filter(col("vec_id") < SimilarityOps.QueryCount)
    val books = SimilarityOps.trainedPqCodebooks(spark, dir)
    val codes = graft.ops.AtomicPublish.readTable(spark,
      SimilarityOps.publishedPqRoot(spark, dir), "pq_codes")
    // the OLD formulation, reconstructed: per-query (m, code) → qd
    // lookup rows, joined to every (query, candidate) code expansion
    val pqM = SimilarityOps.PqM
    val sub = queries.select(col("vec_id"), col("v"),
        (size(col("v")) / pqM).as("subDim"))
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(pqM - 1)),
          m => slice(col("v"), m * col("subDim") + 1, col("subDim"))))
        .as(Seq("m", "sv")))
    val qdot = sub.join(broadcast(books), Seq("m"))
      .select(col("vec_id").as("qid"), col("m"), col("code"),
        graft.functions.VectorFunctions.dot(col("sv"), col("c")).as("qd"))
    val pairs = queries.select(col("vec_id").as("qid"))
      .crossJoin(codes.select(col("vec_id"), col("codes")))
    val ref = pairs
      .select(col("qid"), col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(qdot), Seq("qid", "m", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qd")).as("ref_adot"))
    // the NEW kernel over the same pairs
    val bookRows = SimilarityOps.trainedPqCodebookRows(spark, dir)
    val table: Map[Long, Array[Double]] = queries
      .select(col("vec_id"), col("v")).collect().map { r =>
        val v = r.getSeq[Double](1)
        val subDim = v.length / pqM
        val t = new Array[Double](pqM * SimilarityOps.PqK)
        bookRows.foreach { case (m, code, c, _) =>
          val off = m * subDim
          val n = math.min(subDim, c.length)
          var acc = 0.0
          var i = 0
          while (i < n) { acc += v(off + i) * c(i); i += 1 }
          t(m * SimilarityOps.PqK + code) = acc
        }
        r.getLong(0) -> t
      }.toMap
    val got = pairs.select(col("qid"), col("vec_id"),
      graft.functions.VectorFunctions
        .pqAdcDot(col("qid"), col("codes"), table, pqM).as("adot"))
    val joined = got.join(ref, Seq("qid", "vec_id"))
    assert(joined.count() == pairs.count())
    // BIT-exact, not approximately equal: same IEEE op sequence
    assert(joined.filter(col("adot") =!= col("ref_adot")).count() == 0)
  }

  test("n3b is deterministic across runs (fixed hyperplanes, no RNG at runtime)") {
    val a = SimilarityOps.n3bSrpAnn(spark, dir).collect().toSeq
    val b = SimilarityOps.n3bSrpAnn(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("n3c IVF: exact sims on probed cells, deterministic, recall above chance") {
    val exact = SimilarityOps.n3CosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = SimilarityOps.n3cIvfAnn(spark, dir).collect()
    ivf.foreach { case Row(qid: Long, _, nbr: Long, sim: Double) =>
      exact.get((qid, nbr)).foreach(es => assert(es == sim, s"($qid,$nbr)"))
    }
    val hit = ivf.count { case Row(q: Long, _, n: Long, _) => exact.contains((q, n)) }
    val recall = hit.toDouble / exact.size
    // cells = ivfCellsFor(500) = 23, so 4 probes read ~17% of a RANDOM
    // corpus; centroid-guided probing must hold recall well above that
    // floor (strictly better still on clustered data)
    info(f"IVF recall@10 = $recall%.3f ($hit/${exact.size})")
    assert(recall >= 0.2, f"recall $recall%.3f below probe baseline")
    assert(SimilarityOps.n3cIvfAnn(spark, dir).collect().toSeq == ivf.toSeq)
  }

  test("n3d two-level IVF: exact sims, deterministic, recall above chance") {
    val exact = SimilarityOps.n3CosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf2 = SimilarityOps.n3dIvf2Ann(spark, dir).collect()
    ivf2.foreach { case Row(q: Long, _, n: Long, sim: Double) =>
      exact.get((q, n)).foreach(e => assert(sim == e, s"($q,$n)"))
    }
    val hit = ivf2.count { case Row(q: Long, _, n: Long, _) => exact.contains((q, n)) }
    val recall = hit.toDouble / exact.size
    info(f"two-level IVF recall@10 = $recall%.3f ($hit/${exact.size})")
    // level 1 discards supercells, so recall trails flat IVF — but must
    // stay far above the random floor (candidate cells / cells)
    assert(recall >= 0.15, f"recall $recall%.3f")
    assert(SimilarityOps.n3dIvf2Ann(spark, dir).collect().toSeq == ivf2.toSeq)
  }

  test("n3d collapses EXACTLY to flat n3c when every supercell is probed") {
    // with superProbes ≥ #supercells, level 1 discards nothing and
    // level 2 ranks all cells — bit-identical to the flat probe plan.
    // This pins the two-level machinery as a pure refinement: any
    // recall loss comes only from the intended supercell pruning.
    val widened = SimilarityOps.n3dIvf2Ann(spark, dir,
      superProbes = Int.MaxValue).collect().toSeq
    val flat = SimilarityOps.n3cIvfAnn(spark, dir).collect().toSeq
    assert(widened == flat)
  }

  test("two-level probe budget: per-query centroid dots ~2√cells, codebook never broadcast whole") {
    import org.apache.spark.sql.functions._
    import SimilarityOps.{ivfCellsFor, ivfSupercellsFor, IvfSuperProbes}
    // analytic budget: level-1 dots (supercells) + level-2 dots
    // (cells inside probed supercells ≈ S·√cells) stay well under the
    // flat ranking's `cells` dots once cells is large
    Seq(10000, 65536, 450000).foreach { cells =>
      val scells = ivfSupercellsFor(cells)
      val fanout = math.ceil(cells.toDouble / scells)
      val twoLevel = scells + IvfSuperProbes * fanout
      assert(twoLevel < cells / 10.0,
        s"cells=$cells: two-level $twoLevel dots vs flat $cells")
    }
    // structural: on real data the probed cell set is drawn only from
    // the chosen supercells
    val n = 2000L
    val corp = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .withColumn("nrm",
        sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val cells = ivfCellsFor(n)
    val cents = SimilarityOps.ivfCentroids(corp, cells)
    val (superCents, cellMap) = SimilarityOps.ivfSupercells(cents)
    // probe codebook holds only cell-OWNING supercells (an empty-cluster
    // supercell would let its probers' equi-join silently drop rows)
    val nSuper = superCents.count()
    assert(nSuper >= 1 && nSuper <= ivfSupercellsFor(cells))
    val owned = cellMap.select("scell").distinct()
    assert(superCents.join(owned, Seq("scell"), "left_anti").count() == 0)
    // every cell maps to exactly one supercell — the join path is total
    assert(cellMap.count() == cells)
    assert(cellMap.select("cell").distinct().count() == cells)
  }

  test("two-level build assignment: high agreement with exact, total coverage") {
    import org.apache.spark.sql.functions._
    val corp = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .withColumn("nrm",
        sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val n = corp.count()
    val cents = SimilarityOps.ivfCentroids(corp, SimilarityOps.ivfCellsFor(n))
    val exact = SimilarityOps.assignCells(corp, cents)
      .select("vec_id", "cell").withColumnRenamed("cell", "exact_cell")
    val approx = SimilarityOps.assignCellsTwoLevel(corp, cents)
      .select("vec_id", "cell")
    // every vector lands in exactly one cell — the index is total
    assert(approx.count() == n)
    assert(approx.select("vec_id").distinct().count() == n)
    val joined = approx.join(exact, Seq("vec_id"))
    val agree = joined.filter(col("cell") === col("exact_cell")).count()
    val frac = agree.toDouble / n
    info(f"two-level build agreement with exact assignment: $frac%.3f")
    // the build path probes IvfBuildSuperProbes (6) supercells — wider
    // than the query path's 2, because a build mis-assignment is
    // permanent. Was 0.72 at 2 probes on this worst-case (i.i.d. random,
    // weakly separated) corpus; widening must hold ≥ 0.9. Residual
    // mis-assignments are a recall trade, never a correctness break
    // (probes use the same quantizer).
    assert(frac >= 0.9, f"agreement $frac%.3f — build super-probes too narrow")
    // and the narrow query-width setting still behaves (sanity floor)
    val narrow = SimilarityOps.assignCellsTwoLevel(corp, cents,
      superProbes = SimilarityOps.IvfSuperProbes)
    assert(narrow.count() == n)
  }

  test("ivfCellsFor scales as √n — monotone, clamped (mirrors srpBitsFor)") {
    assert(SimilarityOps.ivfCellsFor(500) == 23)
    assert(SimilarityOps.ivfCellsFor(2000) == 45)
    assert(SimilarityOps.ivfCellsFor(20000) == 142)
    assert(SimilarityOps.ivfCellsFor(1) == SimilarityOps.IvfMinCells)
    assert(SimilarityOps.ivfCellsFor(Long.MaxValue) == SimilarityOps.IvfMaxCells)
    val ns = Seq(100L, 10000L, 1000000L, 100000000L)
    val cs = ns.map(SimilarityOps.ivfCellsFor)
    assert(cs == cs.sorted, s"cells not monotone: $cs")
    // occupancy n/cells ≈ √n and probe work probes·√n — both sublinear
    ns.zip(cs).foreach { case (n, c) =>
      assert(math.abs(c - math.sqrt(n.toDouble)) <= 1.0, s"n=$n cells=$c")
    }
  }

  test("ivfLloydStride bounds codebook training to ~32 samples/cell") {
    import SimilarityOps.{ivfCellsFor, ivfLloydStride, LloydSamplePerCell}
    // below cells×32 the sample IS the corpus — no behavior change
    assert(ivfLloydStride(500, ivfCellsFor(500)) == 1L)
    assert(ivfLloydStride(2000, ivfCellsFor(2000)) == 1L)
    // past it, the sampled count stays ~cells×32 regardless of n
    Seq(100000L, 10000000L, 1000000000L).foreach { n =>
      val cells = ivfCellsFor(n)
      val stride = ivfLloydStride(n, cells)
      val sampled = n / stride
      assert(stride > 1L, s"n=$n")
      assert(sampled <= 2L * cells * LloydSamplePerCell,
        s"n=$n: $sampled sampled for $cells cells")
      assert(sampled >= cells.toLong * LloydSamplePerCell / 2,
        s"n=$n: sample too thin ($sampled for $cells cells)")
    }
  }

  test("sample-trained codebook (stride>1) keeps every cell and a small probed fraction") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 20000
    val rnd = new scala.util.Random(7)
    val big = Seq.tabulate(n) { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val cells = SimilarityOps.ivfCellsFor(n)
    val stride = SimilarityOps.ivfLloydStride(n, cells)
    assert(stride > 1L, "20k corpus must exercise the sampled-training path")
    val cents = SimilarityOps.ivfCentroids(big, cells, stride)
    // seed fallback: no cell lost even where the sample was empty
    assert(cents.count() == cells)
    val assigned = SimilarityOps.assignCells(big, cents).select("cell", "vec_id")
    val probes = SimilarityOps.ivfProbePlan(
      big.filter(col("vec_id") < 8), cents).select("qid", "cell")
    val frac = probes.join(assigned, Seq("cell")).count().toDouble / (8.0 * n)
    info(f"sample-trained probed fraction at n=$n: $frac%.3f")
    assert(frac <= 0.08, f"probed fraction $frac%.3f — sampling degraded the codebook")
  }

  test("IVF probed corpus fraction SHRINKS as the corpus grows (adaptive cells)") {
    import org.apache.spark.sql.functions._
    def fracFor(all: org.apache.spark.sql.DataFrame, n: Long, nQ: Int): Double = {
      val cents = SimilarityOps.ivfCentroids(all, SimilarityOps.ivfCellsFor(n))
      val assigned = SimilarityOps.assignCells(all, cents)
        .select(col("cell"), col("vec_id"))
      val probes = SimilarityOps.ivfProbePlan(
        all.filter(col("vec_id") < nQ), cents).select("qid", "cell")
      probes.join(assigned, Seq("cell")).count().toDouble / (nQ.toLong * n)
    }
    def testdataCorpus(d: String) = graft.core.Tables.embeddings(spark, d)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val n1 = 500L;   val f1 = fracFor(testdataCorpus("/root/testdata/sf0.001"), n1, 8)
    val n2 = 2000L;  val f2 = fracFor(testdataCorpus("/root/testdata/sf0.1"), n2, 8)
    // synthetic 20k corpus (same seed as the SRP wide-code test)
    import spark.implicits._
    val n3 = 20000L
    val rnd = new scala.util.Random(7)
    val big = Seq.tabulate(n3.toInt) { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val f3 = fracFor(big, n3, 8)
    info(f"probed fraction: n=$n1 → $f1%.3f, n=$n2 → $f2%.3f, n=$n3 → $f3%.3f")
    // a fixed codebook probes a CONSTANT fraction; adaptive cells must shrink it
    assert(f1 > f2 && f2 > f3, f"fractions not shrinking: $f1%.3f $f2%.3f $f3%.3f")
    assert(f3 <= 0.08, f"n=20000 still probes $f3%.3f of the corpus — not an index")
  }

  test("IvfTopCells projection == the crossJoin argmax/window rankings " +
      "(the r15 map-only assignment/probe swap)") {
    import org.apache.spark.sql.functions._
    val all = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
    // a real trained codebook shape: first 7 vectors as centroids
    val cents = all.filter(col("vec_id") < 7)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("c"))
    val rows = cents.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    def dot2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.dot(a, b)
    // reference 1: max(struct(csim, cell)) argmax (pre-r15 assignCells)
    val refAssign = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        (dot2(col("v"), col("c")) / (col("nrm") * sqrt(dot2(col("c"), col("c")))))
          .as("csim"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim"), col("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"))
    val fastAssign = all.select(col("vec_id"),
      element_at(graft.functions.VectorFunctions
        .ivfTopCells(col("v"), col("nrm"), rows, 1, tieLargestCell = true),
        1).as("cell"))
    assert(refAssign.exceptAll(fastAssign).isEmpty &&
      fastAssign.exceptAll(refAssign).isEmpty)
    // reference 2: the ORDER BY csim DESC, cell window top-3 (pre-r15
    // probe plan), rank order included
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell"))
    val refProbe = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        (dot2(col("v"), col("c")) / (col("nrm") * sqrt(dot2(col("c"), col("c")))))
          .as("csim"))
      .withColumn("pr", row_number().over(w)).filter(col("pr") <= 3)
      .select(col("vec_id"), col("pr"), col("cell"))
    val fastProbe = all.select(col("vec_id"),
        posexplode(graft.functions.VectorFunctions.ivfTopCells(
          col("v"), col("nrm"), rows, 3, tieLargestCell = false))
          .as(Seq("p0", "cell")))
      .select(col("vec_id"), (col("p0") + 1).as("pr"), col("cell"))
    assert(refProbe.exceptAll(fastProbe).isEmpty &&
      fastProbe.exceptAll(refProbe).isEmpty)
  }
}
