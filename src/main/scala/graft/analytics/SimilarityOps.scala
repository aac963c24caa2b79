package graft.analytics

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Embedding similarity search (SURVEY.md §2.11 N3) over `embeddings`
  * (`vec_id, embedding array<float> dim-64, label`).
  *
  * Two tiers:
  *   1. n3_cosine_topk — brute-force cosine top-k, the oracle-checked
  *      baseline. Query set is the fixed slice `vec_id < 32`; norms are
  *      precomputed per side so the join computes one dot product per
  *      pair, and the query side is broadcast — the fact side streams
  *      through executors with no shuffle, so cost is linear in corpus
  *      size per query.
  *   2. n3b_srp_ann — the scale path: signed-random-projection (SRP)
  *      LSH. Each vector gets T×B sign bits from fixed Gaussian
  *      hyperplanes (seeded, so identical on every executor/cluster);
  *      B bits pack into a bucket id per table; candidate pairs are
  *      bucket collisions (an equi-join on (table, bucket) — shuffles
  *      only ids+buckets, never vectors); exact cosine runs on
  *      candidates only. Sketch size per vector is T ints regardless of
  *      corpus size; bucket fan-out is tuned by B (occupancy ≈ n/2^B).
  *      Deterministic but approximate → no SQL oracle; recall vs the
  *      brute-force baseline is asserted in SimilarityOpsSpec.
  *
  * Reference analog: the reference has no vector operations (verified
  * absence, SURVEY.md §2.11); this is north-star surface for
  * training-data pipelines.
  */
object SimilarityOps {

  val QueryCount = 32
  val TopK = 10

  /** Native codegen'd expression (graft.functions.VectorFunctions) —
    * left-to-right sum, same order DuckDB's list_dot_product uses, so
    * double math matches to well under the 4dp rounding we publish. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  private def norm(v: Column): Column = sqrt(dot(v, v))

  /** Corpus with embeddings cast to double and norms precomputed. */
  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** N3: exact cosine top-10 neighbors for each query vector
    * (vec_id < 32), ties broken by neighbor id. */
  def n3CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val all = corpus(spark, dir)
    val q = all.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val sims = all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nbr"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  val n3CosineTopkSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $QueryCount),
      |sims AS (
      |  SELECT qid, n.vec_id AS nbr,
      |    round(list_dot_product(qv, v) / (qn * nrm), 4) AS sim
      |  FROM q CROSS JOIN n WHERE n.vec_id <> qid),
      |ranked AS (
      |  SELECT qid, nbr, sim,
      |    (row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nbr))::BIGINT AS rank
      |  FROM sims)
      |SELECT qid, rank, nbr, sim FROM ranked WHERE rank <= $TopK
      |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------------------

  val SrpTables = 8
  val SrpBits = 6 // 64 buckets/table — occupancy n/64, tune up with corpus size

  /** Fixed Gaussian hyperplanes, seeded — java.util.Random's algorithm is
    * specified, so every JVM/executor derives identical planes. */
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new Random(42)
    Array.fill(SrpTables * SrpBits, 64)(rnd.nextGaussian())
  }

  /** (vec_id, table, bucket) — one row per vector per LSH table. */
  def srpBuckets(vectors: DataFrame): DataFrame = {
    val buckets = (0 until SrpTables).map { t =>
      (0 until SrpBits).map { j =>
        val proj = dot(col("v"), typedLit(planes(t * SrpBits + j).toSeq))
        when(proj > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    vectors.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(array(buckets: _*)).as(Seq("table", "bucket")))
  }

  /** N3b: SRP-LSH approximate top-10 for the same query slice. Bucket
    * collisions → candidates → exact cosine → rank. Missing true
    * neighbors is possible (LSH false negatives); emitted sims are
    * exact. */
  def n3bSrpAnn(spark: SparkSession, dir: String): DataFrame = {
    val all = corpus(spark, dir)
    val banded = srpBuckets(all)
    val qb = banded.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("qid"), col("table"), col("bucket"))
    val cand = banded.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr")).distinct()
    val q = all.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val sims = cand
      .join(all.select(col("vec_id").as("nbr"), col("v"), col("nrm")), Seq("nbr"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("nbr"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nbr"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  // --- IVF (inverted-file) ANN ------------------------------------------------

  val IvfCells = 16
  val IvfProbes = 4

  /** Deterministic IVF codebook: seed centroids are the vectors with the
    * K smallest vec_ids (any deterministic rule works for a seeded
    * coarse quantizer), refined by ONE Lloyd step — per-cell mean via a
    * posexplode/groupBy/rebuild, all set-oriented (no driver iteration,
    * no RNG). Returns (cell, centroid array<double>). */
  def ivfCentroids(vectors: DataFrame): DataFrame = {
    val seeds = vectors.orderBy(col("vec_id")).limit(IvfCells)
      .select(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("vec_id")))
        .as("cell"), col("v").as("c"))
    val assigned = assignCells(vectors, seeds)
    // Lloyd step: element-wise mean of each cell's member vectors
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"),
        transform(col("pm"), e => e.getField("m")).as("c"))
  }

  /** Nearest centroid (max cosine) per vector: broadcast the K-row
    * codebook, argmax via one max(struct) aggregation. */
  private def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        (dot(col("v"), col("c")) / (col("nrm") * sqrt(dot(col("c"), col("c")))))
          .as("csim"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim"), col("cell"))).as("best"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("best.cell").as("cell"))

  /** N3c: IVF-flat approximate top-10 for the query slice — assign the
    * corpus to cells once, probe the `IvfProbes` best cells per query,
    * exact cosine on the probed cells only. Deterministic; no SQL
    * oracle (spec asserts exactness-of-sims + recall lift). At 100 TB
    * the cell assignment is the partition key (cluster-by cell at
    * write), so a probe reads `IvfProbes/IvfCells` of the corpus. */
  def n3cIvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val all = corpus(spark, dir)
    // 16-row codebook consumed by both corpus assignment and query
    // probing — persist so the Lloyd pass runs once (the codebook is a
    // model parameter, constant-size regardless of corpus scale)
    val cents = ivfCentroids(all).persist()
    val assigned = assignCells(all, cents)
    // nprobe best cells per query
    val qProbe = all.filter(col("vec_id") < QueryCount)
      .crossJoin(broadcast(cents))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("cell"),
        (dot(col("v"), col("c")) / (col("nrm") * sqrt(dot(col("c"), col("c")))))
          .as("csim"))
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("csim").desc, col("cell"))
    val probes = qProbe.withColumn("pr", row_number().over(w0))
      .filter(col("pr") <= IvfProbes)
      .select(col("qid"), col("qv"), col("qn"), col("cell"))
    val sims = probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nbr"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  val NearDupThreshold = 0.4 // synthetic corpus is i.i.d. random (top pair
                             // sims ~0.4-0.5); real near-dup corpora use ~0.9

  /** N5c: embedding-cosine near-duplicate PAIRS over the whole corpus —
    * the dedup-by-embedding tier of a training-data pipeline. Candidates
    * come from SRP bucket collisions (shuffling ids+buckets only), then
    * exact cosine verifies each candidate; output is every candidate
    * pair with sim ≥ threshold. Approximate in the same way n2b is
    * (banding false negatives possible, emitted sims exact) → no SQL
    * oracle; spec asserts exact-sim agreement with brute force and
    * recall lift. At 100 TB: bucket join is an equi-shuffle on
    * (table, bucket); vectors join in by id afterwards, so full
    * embeddings never ride the candidate shuffle. */
  def n5EmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val all = corpus(spark, dir)
    val banded = srpBuckets(all).select(col("vec_id"), col("table"), col("bucket"))
    val cand = banded.toDF("va", "table", "bucket")
      .join(banded.toDF("vb", "table", "bucket"), Seq("table", "bucket"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb")).distinct()
    val vecs = all.select(col("vec_id"), col("v"), col("nrm"))
    cand
      .join(vecs.toDF("va", "v_a", "n_a"), Seq("va"))
      .join(vecs.toDF("vb", "v_b", "n_b"), Seq("vb"))
      .select(col("va"), col("vb"),
        round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4).as("sim"))
      .filter(col("sim") >= NearDupThreshold)
      .orderBy(col("va"), col("vb"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n3_cosine_topk" -> (n3CosineTopk _),
    "n3b_srp_ann" -> (n3bSrpAnn _),
    "n3c_ivf_ann" -> (n3cIvfAnn _),
    "n5_embed_neardup" -> (n5EmbedNearDup _),
  )

  def oracleSql: Map[String, String] = Map(
    "n3_cosine_topk" -> n3CosineTopkSql,
    // n3b_srp_ann, n5_embed_neardup: approximate (LSH candidates) — no
    // SQL oracle; exact-sim agreement + recall asserted in spec
  )
}
