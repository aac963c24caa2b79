package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The sketch-trio bracket wrappers (VERDICT r11 ask #1): n2b, n5 and
  * n8 ride the hash gate as an exact, DuckDB-recomputable payload plus
  * engine-computed booleans. The gate proves the flags land true; this
  * spec proves each flag CAN fail — a bracket that cannot flip would be
  * decoration — and that the hashed payload is the exact reference. */
class SketchBracketSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("n2b bracket: payload is n2's exact pair set, flags true at the declared floor") {
    val rows = DedupOps.n2bMinhashLshBracket(spark, dir).collect()
    val exact = DedupOps.n2PairsShared(spark, dir)
      .orderBy(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).sameElements(exact))
    assert(exact.nonEmpty)
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)))
  }

  test("n2b bracket: an unreachable recall floor flips recall_ok, subset_ok unaffected") {
    val strict = DedupOps.n2bBracketAt(spark, dir, recallFloor = 1.01)
    val flags = strict.select("subset_ok", "recall_ok").distinct().collect()
    assert(flags.length == 1)
    assert(flags.head.getBoolean(0), "subset_ok is independent and stays true")
    assert(!flags.head.getBoolean(1), "recall_ok should have flipped false")
  }

  test("n5 bracket: payload is the exact slice pair set, flags true at the declared floor") {
    val rows = SimilarityOps.n5EmbedNearDupBracket(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(3) && r.getBoolean(4)))
    // every payload pair touches the query slice and carries an exact sim
    assert(rows.forall(r => r.getLong(0) < SimilarityOps.QueryCount))
    assert(rows.forall(r => r.getDouble(2) >= SimilarityOps.NearDupThreshold))
    // the payload is a SUPERSET of the production slice pairs (banding
    // only loses pairs, never invents them)
    val prodSlice = SimilarityOps.n5EmbedNearDup(spark, dir)
      .filter(col("va") < SimilarityOps.QueryCount)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val payload = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prodSlice.subsetOf(payload))
  }

  test("n5 bracket: an unreachable recall floor flips recall_ok") {
    val strict = SimilarityOps.n5BracketAt(spark, dir, recallFloor = 1.01)
    val flags = strict.select("subset_ok", "recall_ok").distinct().collect()
    assert(flags.length == 1)
    assert(flags.head.getBoolean(0))
    assert(!flags.head.getBoolean(1))
  }

  test("n8 bracket: payload clusters the exact slice pairs; prod_ok true on the real pipeline") {
    val rows = SimilarityOps.n8SemanticClustersBracket(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)))
    // label sanity on the payload: cluster_id = min member, csize = count
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid)
      assert(members.forall(_.getLong(2) == members.length))
    }
  }

  test("n8 bracket: a corrupted production output flips prod_ok") {
    val good = SimilarityOps.n8SemanticClusters(spark, dir)
    // (a) a split edge: relabel one vector into its own cluster
    val split = good.withColumn("cluster_id",
      when(col("vec_id") === good.agg(max("vec_id")).collect()(0).getLong(0),
        col("vec_id") + 1000000L).otherwise(col("cluster_id")))
    val f1 = SimilarityOps.n8BracketOn(spark, dir, split)
      .select("prod_ok").distinct().collect()
    assert(f1.length == 1 && !f1.head.getBoolean(0),
      "a mislabeled member must flip prod_ok")
    // (b) a wrong csize
    val inflated = good.withColumn("csize", col("csize") + 1L)
    val f2 = SimilarityOps.n8BracketOn(spark, dir, inflated)
      .select("prod_ok").distinct().collect()
    assert(f2.length == 1 && !f2.head.getBoolean(0),
      "an inconsistent csize must flip prod_ok")
  }
}
