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

  test("n3b SRP-LSH: exact sims, ranked subsets, recall well above chance") {
    val exact = SimilarityOps.n3CosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = SimilarityOps.n3bSrpAnn(spark, dir).collect()

    // every ANN sim must equal the exact sim for that pair (verification
    // is exact; only candidate generation is approximate)
    val full = SimilarityOps.n3CosineTopk(spark, dir)
    ann.foreach { case Row(qid: Long, _, nbr: Long, sim: Double) =>
      exact.get((qid, nbr)).foreach(es => assert(es == sim, s"($qid,$nbr)"))
    }

    val hit = ann.count { case Row(q: Long, _, n: Long, _) => exact.contains((q, n)) }
    val recall = hit.toDouble / exact.size

    // On i.i.d. random vectors any LSH recall is bounded by how many
    // candidates it inspects, so the meaningful score is the LIFT over
    // random candidate sampling: recall / (candidate fraction).
    val corpus = graft.core.Tables.embeddings(spark, dir).count()
    val banded = SimilarityOps.srpBuckets(
      graft.core.Tables.embeddings(spark, dir)
        .selectExpr("vec_id", "cast(embedding as array<double>) as v",
          "1.0 as nrm"))
    val qb = banded.filter(s"vec_id < ${SimilarityOps.QueryCount}")
      .selectExpr("vec_id as qid", "table", "bucket")
    val nCand = banded.join(qb, Seq("table", "bucket"))
      .filter("vec_id != qid").selectExpr("qid", "vec_id").distinct().count()
    val candFrac = nCand.toDouble / (SimilarityOps.QueryCount * (corpus - 1))
    val lift = recall / candFrac
    info(f"SRP-LSH recall@10 = $recall%.3f ($hit/${exact.size}), " +
      f"candidate fraction = $candFrac%.3f, lift = $lift%.1f×")
    assert(recall >= 0.2, f"recall $recall%.3f collapsed")
    assert(candFrac <= 0.25, f"candidate fraction $candFrac%.3f too high — not ANN")
    assert(lift >= 2.0, f"lift $lift%.1f: no better than random sampling")
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

  test("n3b is deterministic across runs (fixed hyperplanes, no RNG at runtime)") {
    val a = SimilarityOps.n3bSrpAnn(spark, dir).collect().toSeq
    val b = SimilarityOps.n3bSrpAnn(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("n3c IVF: exact sims on probed cells, deterministic, recall above probe ratio") {
    val exact = SimilarityOps.n3CosineTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = SimilarityOps.n3cIvfAnn(spark, dir).collect()
    ivf.foreach { case Row(qid: Long, _, nbr: Long, sim: Double) =>
      exact.get((qid, nbr)).foreach(es => assert(es == sim, s"($qid,$nbr)"))
    }
    val hit = ivf.count { case Row(q: Long, _, n: Long, _) => exact.contains((q, n)) }
    val recall = hit.toDouble / exact.size
    // probing 4/16 cells reads 25% of a RANDOM corpus; centroid-guided
    // probing must do at least as well (strictly better on clustered data)
    info(f"IVF recall@10 = $recall%.3f ($hit/${exact.size})")
    assert(recall >= 0.2, f"recall $recall%.3f below probe baseline")
    assert(SimilarityOps.n3cIvfAnn(spark, dir).collect().toSeq == ivf.toSeq)
  }
}
