package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the cluster-resolution step
  * a dedup pipeline needs AFTER pair generation: near-dup pairs (n2/n2b/
  * n4/n5) only relate documents two at a time, but the keep/drop decision
  * is per CLUSTER (keep one canonical doc per duplicate group, drop the
  * rest). Pairs are the edge list of an undirected graph; the cluster id
  * is the component's minimum doc id — deterministic, layout-independent,
  * and exactly what a canonical-election policy keys on.
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING.
  * Each round every node takes the minimum label over itself and its
  * neighbors (one shuffle: edges ⋈ labels, groupBy dst), then labels
  * compress through their own indirection (labels ⋈ labels — label(x) :=
  * label(label(x))). Propagation alone needs O(diameter) rounds (an
  * adversarial near-dup CHAIN a~b~c~… makes that O(n)); the jumping step
  * halves every label-chain each round, so convergence is O(log n)
  * rounds — the hash-to-min bound (Rastogi et al., "Finding Connected
  * Components in Map-Reduce in Logarithmic Rounds", ICDE'13), the same
  * shape GraphFrames/GraphX use. Each round is a constant number of
  * hash-joins on (id → label) pairs — 16 bytes a row regardless of
  * document size, so the iteration state at 100 TB of text is a few GB
  * of ids. Per-round truncation uses [[org.apache.spark.sql.graftstream
  * .StreamingBridge.checkpointFresh]] — localCheckpoint to materialize
  * (an iterative plan otherwise doubles in depth each round and
  * re-executes history) PLUS a rebind to default statistics: a bare
  * localCheckpoint carries the round plan's estimated size onto the
  * checkpoint, round k's estimate multiplies round k-1's, and the
  * doubly-exponential product overflows BigInteger at ~14 rounds (hit
  * by long duplicate chains in the 10× rehearsal corpus).
  *
  * Reference boundary: the reference pipeline has no graph surface at
  * all (/root/reference/app/etl/transformers.py deduplicates by exact
  * key only); this is part of the §2.11 north-star tier.
  */
object ClusterOps {

  /** Component labels for every node of the undirected edge list
    * `pairs` (two columns: src, dst — column names are taken
    * positionally). Returns (doc_id, cluster_id): one row per distinct
    * node, cluster_id = min doc id reachable from it. Deterministic on
    * any partitioning. Throws after `maxRounds` non-converged rounds
    * (log₂-bounded convergence makes 50 astronomically past any real
    * graph: 2^50 nodes). */
  /** Edge-count bound for the DRIVER fast path — the same
    * model-sized-collect discipline as [[graft.analytics.DedupOps
    * .MaxSharedPairs]] (near-dup edge lists are distilled pair sets,
    * orders of magnitude smaller than the corpus; the bench corpora
    * produce a few hundred). Below it the component labels come from an
    * in-memory union-find in ONE collect — the distributed loop costs
    * ~12 scheduler jobs PER ROUND regardless of size, which at a
    * 180-edge graph was 54 jobs of pure overhead. Above it the
    * pointer-jumping rounds run exactly as before (the 100 TB shape:
    * iteration state is 16-byte rows, never text). */
  val DriverCcMaxEdges = 200000

  /** Min-label union-find over a driver-local edge list: returns
    * (node → component minimum), the same labels the distributed
    * rounds converge to. */
  private[analytics] def unionFindLabels(
      edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (x, y) =>
      parent.getOrElseUpdate(x, x); parent.getOrElseUpdate(y, y)
      val rx = find(x); val ry = find(y)
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    parent.keysIterator.map(x => x -> find(x)).toMap
  }

  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val a = pairs.columns(0)
    val b = pairs.columns(1)
    import org.apache.spark.sql.graftstream.StreamingBridge.{checkpointFresh, unpersistCheckpoint}
    // Driver fast path: one bounded collect decides; an overflow falls
    // through to the distributed rounds having spent one short-circuited
    // limit pass. Output is identical by construction (component minima).
    val head = pairs.select(col(a).cast("long"), col(b).cast("long"))
      .limit(DriverCcMaxEdges + 1).collect()
    if (head.length <= DriverCcMaxEdges) {
      val labels = unionFindLabels(
        head.map(r => (r.getLong(0), r.getLong(1))))
      val spark = pairs.sparkSession
      import spark.implicits._
      return labels.toSeq.toDF("doc_id", "cluster_id")
    }
    val edges = checkpointFresh(
      pairs.select(col(a).as("src"), col(b).as("dst"))
        .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
        .distinct())
    var labels = checkpointFresh(
      edges.select(col("src").as("id"))
        .distinct()
        .withColumn("lbl", col("id")))
    // round-k handles released once round k+1 is materialized — without
    // this every round pinned another label table's blocks for the life
    // of the session (the ADVICE-r14 BPE leak, same shape)
    var prevRound: DataFrame = labels
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      require(rounds <= maxRounds,
        s"connectedComponents did not converge in $maxRounds rounds " +
          "(a graph needing that many has ~2^" + maxRounds + " nodes)")
      // min label over the neighborhood: edge (src→dst) carries src's
      // current label to dst; a node's candidate is the min over its
      // own label and every neighbor's
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("lbl").as("slbl")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("slbl")).as("nmin"))
      // materialized ONCE: the pointer-jump consumes propagated on BOTH
      // join sides, and DataFrame branches re-execute their subtree —
      // before r15 the edges⋈labels⋈groupBy tree ran twice per round.
      // `old` (the incoming label) rides along so the convergence test
      // needs no separate join against the previous label table.
      val propagated = checkpointFresh(labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), col("nmin")).as("lbl"),
          col("lbl").as("old")))
      // pointer jumping: label(x) := label(label(x)) — labels are node
      // ids (minima over node ids), so the lookup always resolves; chg
      // marks rows whose FINAL label moved this round, so convergence
      // is a filter over this round's cached blocks, not a fresh join
      val jumped = checkpointFresh(propagated
        .join(propagated.select(col("id").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"))
        .select(col("id"), col("lbl2").as("lbl"),
          (col("lbl2") =!= col("old")).as("chg")))
      unpersistCheckpoint(propagated) // consumed by jumped's materialization
      if (prevRound != null) unpersistCheckpoint(prevRound)
      converged = jumped.filter(col("chg")).isEmpty
      prevRound = jumped
      labels = jumped.select(col("id"), col("lbl"))
    }
    unpersistCheckpoint(edges) // labels are checkpointed — edges done
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** INCREMENTAL connected components — the published-state pattern
    * (n1b / n2-incremental / n3e) applied to cluster resolution:
    * `published` is the label table of an earlier run (doc_id,
    * cluster_id); `newPairs` are the pairs with at least one new side
    * (e.g. [[DedupOps.n2PairsIncrementalOn]]'s output). Returns labels
    * for the UNION — equal to a from-scratch run over all pairs —
    * while touching only O(new + affected) rows:
    *
    *  - published clusters NOT touched by any new pair carry their
    *    labels BY REFERENCE (an anti join; their members are never
    *    re-labeled, their pairs never re-derived);
    *  - touched clusters are rejoined through STAR EDGES (member →
    *    cluster id): a component is connected through its hub, so
    *    cc(star ∪ newPairs) has exactly the connectivity of
    *    cc(allPairs) on the affected subgraph — the published PAIRS
    *    are never needed again, which is the point: pair derivation
    *    (the PPJoin) is the expensive step, and its output is distilled
    *    into |docs| labels instead of |pairs| edges.
    *
    * Label stability: cluster ids are component minima, and a merge
    * can only lower a member's id (the union's component contains every
    * constituent). An untouched cluster's id is untouched. */
  def connectedComponentsIncremental(newPairs: DataFrame,
      published: DataFrame): DataFrame = {
    val pub = published.select(col(published.columns(0)).as("doc_id"),
      col(published.columns(1)).as("cluster_id"))
    val a = newPairs.columns(0)
    val b = newPairs.columns(1)
    val touchedDocs = newPairs.select(col(a).as("doc_id"))
      .unionByName(newPairs.select(col(b).as("doc_id"))).distinct()
    val touchedClusters = pub.join(touchedDocs, Seq("doc_id"))
      .select("cluster_id").distinct()
    val affected = pub.join(touchedClusters, Seq("cluster_id"), "left_semi")
    val star = affected.select(col("doc_id").as(a), col("cluster_id").as(b))
    val relabeled = connectedComponents(
      star.unionByName(newPairs.select(col(a), col(b))))
    pub.join(touchedClusters, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
      .unionByName(relabeled)
  }
}
