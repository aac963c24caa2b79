package graft.analytics

import org.apache.spark.sql.Row

import graft.SparkSuite

/** Connected-component cluster resolution (n7): the iterative
  * min-label + pointer-jumping algorithm against a driver-side
  * union-find reference on adversarial shapes, and the composed
  * n7 query's contract. */
class ClusterOpsSpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side union-find — the reference implementation CC is
    * judged against. */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // roots are already component minima: union always parents the
    // larger root under the smaller
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ClusterOps.connectedComponents(pairs.toDF("da", "db"))
      .collect().map { case Row(d: Long, c: Long) => d -> c }.toMap

  test("cc matches union-find on a mixed graph (two components + bridge)") {
    val pairs = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 1L), (12L, 10L),
      (5L, 6L))
    assert(ccOf(pairs) == ufComponents(pairs))
  }

  test("cc converges on an adversarial CHAIN in logarithmic rounds") {
    // a 64-node path: plain propagation needs 63 rounds; pointer
    // jumping must close it well inside the 50-round guard
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = ccOf(chain)
    assert(got.size == 64)
    assert(got.values.toSet == Set(0L))
  }

  test("cc survives a DEEP chain (stats-overflow regression, ~13 rounds)") {
    // 5000-node path → ~13 pointer-jumping rounds. Before the
    // checkpointFresh fix, each round's localCheckpoint inherited the
    // round plan's ESTIMATED size (rewriteStatsAndConstraints), the
    // estimates compounded doubly-exponentially across rounds, and
    // stats estimation threw `BigInteger would overflow supported
    // range` at about round 14 — first hit by the 10× rehearsal
    // corpus' long duplicate chains. This chain pins the regime.
    val chain = (0L until 4999L).map(i => (i, i + 1))
    val got = ccOf(chain)
    assert(got.size == 5000)
    assert(got.values.toSet == Set(0L))
  }

  test("cc handles high-degree stars and duplicate/reversed edges") {
    val star = (1L to 40L).map(i => (i, 0L)) ++ (1L to 40L).map(i => (0L, i))
    val got = ccOf(star ++ star)
    assert(got.size == 41)
    assert(got.values.toSet == Set(0L))
  }

  test("cc of an empty pair set is empty") {
    assert(ccOf(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("incremental cc ≡ from-scratch on the union (merge, extend, untouched)") {
    // published: {1,2,3} (id 1), {10,11} (id 10), {20,21} (id 20)
    val pubPairs = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val published = ClusterOps.connectedComponents(pubPairs.toDF("da", "db"))
    // new pairs: extend {1..} with 4; MERGE {10,11} and {20,21} through
    // new doc 15; fresh component {30,31}; cluster {1,2,3} + {new 0}
    // lowers the canonical id of a published cluster
    val newPairs = Seq[(Long, Long)](
      (3L, 4L), (11L, 15L), (15L, 20L), (30L, 31L), (0L, 1L))
    val inc = ClusterOps.connectedComponentsIncremental(
      newPairs.toDF("da", "db"), published)
      .collect().map { case Row(d: Long, c: Long) => d -> c }.toMap
    val full = ccOf(pubPairs ++ newPairs)
    assert(inc == full)
    // spot semantics: merge landed on min(10, 15, 20) = 10; the
    // 0-join lowered {1,2,3,4}'s id to 0
    assert(inc(21L) == 10L && inc(15L) == 10L)
    assert(inc(3L) == 0L && inc(4L) == 0L)
    assert(inc(30L) == 30L)
  }

  test("incremental cc carries untouched clusters without relabeling") {
    val pubPairs = Seq[(Long, Long)]((1L, 2L), (50L, 51L))
    val published = ClusterOps.connectedComponents(pubPairs.toDF("da", "db"))
    val inc = ClusterOps.connectedComponentsIncremental(
      Seq[(Long, Long)]((100L, 101L)).toDF("da", "db"), published)
      .collect().map { case Row(d: Long, c: Long) => d -> c }.toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 50L -> 50L, 51L -> 50L,
      100L -> 100L, 101L -> 100L))
  }

  test("n8 semantic clusters = union-find over n5's pairs, sizes attached") {
    val dir = "/root/testdata/sf0.001"
    val pairs = SimilarityOps.n5EmbedNearDup(spark, dir)
      .select("va", "vb").collect()
      .map { case Row(a: Long, b: Long) => (a, b) }
    assert(pairs.nonEmpty)
    val got = SimilarityOps.n8SemanticClusters(spark, dir).collect()
      .map { case Row(v: Long, c: Long, s: Long) => v -> (c, s) }.toMap
    assert(got.map { case (v, (c, _)) => v -> c } == ufComponents(pairs.toSeq))
    got.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      members.values.foreach { case (_, s) => assert(s == members.size) }
    }
  }

  test("n7 clusters agree with n2 pairs: every pair lands in one cluster") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // exact-ish dup
      (3L, "a b c d e f g x"), // near 1,2
      (4L, "q w e r t y u i"), (5L, "q w e r t y u i"), // second cluster
      (6L, "z z z unrelated doc entirely")).toDF("doc_id", "text")
    val pairs = DedupOps.n2PairsOn(docs)
      .select("da", "db").collect().map { case Row(a: Long, b: Long) => (a, b) }
    assert(pairs.nonEmpty)
    val clusters = DedupOps.n7DupClustersOn(docs).collect()
      .map { case Row(d: Long, c: Long, s: Long) => d -> (c, s) }.toMap
    // exactly the docs in pairs are clustered
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // a pair's two docs share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split") }
    // cluster id is the member minimum; csize counts members
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      members.values.foreach { case (_, s) => assert(s == members.size) }
    }
    // union-find agreement end-to-end
    assert(clusters.map { case (d, (c, _)) => d -> c } ==
      ufComponents(pairs.toSeq))
  }
}
