package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** Skew armor for the near-dup candidate generators (VERDICT r10 weak
  * #1/#2): exact-duplicate pre-collapse + hard per-group occupancy caps
  * must bound per-task candidate volume on adversarial corpora while
  * leaving the organic-corpus output bit-identical (the oracle gate
  * covers the latter; the zero-drop asserts here prove the caps never
  * fired on it).
  */
class DedupCapSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  /** 10k exact copies of one document (the mega-duplicate cluster a
    * boilerplate-heavy corpus produces), one genuine near-dup of it, and
    * unrelated fillers. */
  private lazy val megaCorpus: DataFrame = {
    val megaText = words("m", 20) // 18 shingles
    val nearText = words("m", 19) + " zz" // shares 17/19 distinct shingles
    val fillers = (2L to 5L).map(i => (i, words(s"f${i}x", 12)))
    val base = Seq((1L, nearText)) ++ fillers
    val copies = (1000L until 11000L).map(i => (i, megaText))
    (base ++ copies).toDF("doc_id", "text")
  }

  private val MegaCopies = 10000L
  private val IntraPairs = MegaCopies * (MegaCopies - 1) / 2 // 49,995,000
  private val CrossJ = BigDecimal(17.0 / 19.0)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // 0.8947

  test("exact-dup pre-collapse: the mega cluster enters the pairwise stage as ONE representative") {
    val lab = DedupOps.exactClasses(DedupOps.shingleSets(megaCorpus),
      xxhash64(col("hs")))
    val reps = lab.filter(col("doc_id") === col("rep"))
    assert(reps.count() == 6L) // near + 4 fillers + 1 mega rep
    val mega = lab.filter(col("csize") === MegaCopies)
    assert(mega.count() == MegaCopies)
    assert(mega.select(min("rep")).head().getLong(0) == 1000L)
    assert(mega.select(max("rep")).head().getLong(0) == 1000L)
  }

  test("capOccupancy bounds every group at the cap and observes the drops") {
    val rows = (1L to 200L).map(i => (i, 7L)) ++ (301L to 310L).map(i => (i, 9L))
    val df = rows.toDF("doc_id", "ph")
    val capped = DedupOps.capOccupancy(df, Seq(col("ph")), "test_cap", 64)
    capped.collect() // executes capped's own QueryExecution -> metrics live
    val byGroup = capped.groupBy("ph").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byGroup == Map(7L -> 64L, 9L -> 10L))
    assert(DedupOps.observedDrops(capped, "test_cap") == 136L)
    // kept rows are the LOWEST doc_ids — deterministic on any layout
    assert(capped.filter(col("ph") === 7L).select(max("doc_id"))
      .head().getLong(0) == 64L)
  }

  test("n2 on a 10k-copy mega cluster: bounded work, exact expanded output") {
    val out = DedupOps.n2PairsOn(megaCorpus)
    val summary = out.agg(
      count(lit(1)).as("total"),
      sum(when(col("jaccard") === 1.0, 1L).otherwise(0L)).as("intra"),
      sum(when(col("jaccard") =!= 1.0 && col("da") === 1L, 1L).otherwise(0L))
        .as("cross"),
      min(when(col("jaccard") =!= 1.0, col("jaccard"))).as("jmin"),
      max(when(col("jaccard") =!= 1.0, col("jaccard"))).as("jmax"))
    val Row(total: Long, intra: Long, cross: Long, jmin: Double, jmax: Double) =
      summary.collect()(0)
    assert(total == IntraPairs + MegaCopies)
    assert(intra == IntraPairs)
    assert(cross == MegaCopies) // near-dup doc 1 pairs with EVERY copy
    assert(jmin == CrossJ && jmax == CrossJ)
    // the collapse left nothing for the posting cap to drop: exact output
    assert(DedupOps.observedDrops(summary, "n2_posting") == 0L)
  }

  test("n2b on the same mega cluster finds the identical expanded pair set") {
    val out = DedupOps.n2bMinhashLshOn(megaCorpus)
    val summary = out.agg(
      count(lit(1)).as("total"),
      sum(when(col("jaccard") === 1.0, 1L).otherwise(0L)).as("intra"),
      sum(when(col("jaccard") =!= 1.0 && col("da") === 1L, 1L).otherwise(0L))
        .as("cross"))
    val Row(total: Long, intra: Long, cross: Long) = summary.collect()(0)
    assert(intra == IntraPairs)
    // identical signatures collide in every band, so the mega class's
    // pairs are guaranteed; the one cross-class rep pair (J≈0.89) is
    // found by these texts' (deterministic) band collisions
    assert(cross == MegaCopies)
    assert(total == IntraPairs + MegaCopies)
    assert(DedupOps.observedDrops(summary, "n2b_bucket") == 0L)
  }

  test("n2 posting cap fires on a shared-rare-shingle crowd without changing the answer") {
    // 400 DISTINCT docs all sharing one shingle, pairwise J = 1/3 < θ:
    // ~half put the shared shingle in their length-1 prefix, blowing the
    // posting group past the cap — drops observed, output empty either way
    val crowd = (1L to 400L).map(i => (i, s"zzq zzr zzs t$i"))
      .toDF("doc_id", "text")
    val out = DedupOps.n2PairsOn(crowd)
    val cnt = out.agg(count(lit(1)).as("n"))
    assert(cnt.collect()(0).getLong(0) == 0L)
    assert(DedupOps.observedDrops(cnt, "n2_posting") > 0L)
  }

  test("n2b bucket cap fires on a distinct near-dup crowd: bounded candidates, verified subset") {
    // 100 DISTINCT docs, pairwise J = 57/59 ≈ 0.9661 ≥ θ — all collide in
    // most bands, occupancy > cap, so drops are a (documented) recall
    // trade on this op's already-approximate contract
    val base = words("w", 59)
    val crowd = (1L to 100L).map(i => (i, s"$base u$i")).toDF("doc_id", "text")
    val out = DedupOps.n2bMinhashLshOn(crowd)
    val rows = out.collect()
    assert(DedupOps.observedDrops(out, "n2b_bucket") > 0L)
    assert(rows.nonEmpty && rows.length <= 100 * 99 / 2)
    val expJ = BigDecimal(57.0 / 59.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case Row(da: Long, db: Long, j: Double) =>
      assert(da < db && j == expJ)
    }
  }

  test("organic corpus: zero drops, n2 oracle output byte-identical shape") {
    val docs = Tables.documents(spark, dir)
    val n2 = DedupOps.n2PairsOn(docs)
    val got = n2.collect()
    assert(DedupOps.observedDrops(n2, "n2_posting") == 0L)
    val lsh = DedupOps.n2bMinhashLshOn(docs)
    val lshRows = lsh.collect()
    assert(DedupOps.observedDrops(lsh, "n2b_bucket") == 0L)
    // the sketch path's verified pairs stay a subset of exact n2
    assert(lshRows.toSet.subsetOf(got.toSet))
  }
}
