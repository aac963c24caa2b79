package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: run the heavyweight corpus queries (llm1, n2*, n3*,
  * n5) on a 10× replica of the sf0.1 corpus ("sf1") and compare against
  * their measured sf0.1 cost, to confirm the candidate-volume and
  * probed-fraction curves hold off the spec corpus (SURVEY §8 records
  * the numbers; the bar is: no query above 2× its linear extrapolation).
  *
  * The 10× corpus is built from the driver's sf0.1 tables by replication
  * with a structure-preserving perturbation — each replica must look
  * like NEW data (otherwise every doc gains 9 cross-replica duplicates
  * and the dedup stages measure a corpus that couldn't exist), while
  * every per-replica statistic the pipelines key on stays EXACTLY that
  * of the base corpus, so exact-pipeline outputs must scale exactly 10×
  * (asserted, not assumed):
  *
  *  - documents: words of length ≥ 4 are Caesar-ciphered per replica
  *    (lowercase→lowercase, uppercase→uppercase). Token count, char
  *    length, punctuation ratio (non-[a-z0-9 ] chars) and stopword
  *    ratio (the t2 stoplist is all ≤3-char words, left untouched) are
  *    preserved exactly → quarantine/quality/chunk counts replicate;
  *    word-3-gram shingles and 8-gram decontam hashes involving any
  *    ciphered word differ across replicas → no new cross-replica
  *    near-dup pairs at θ=0.8; all-short-word n-grams ARE shared across
  *    replicas, but any contamination they cause is already caused by
  *    the same n-gram in the replica's own eval slice (the eval slice
  *    replicates with the corpus: doc_id offsets are multiples of
  *    DecontamEvalMod, so `doc_id % mod` is replica-invariant).
  *  - embeddings: per replica, a seeded dimension permutation + sign
  *    flip. Within-replica geometry is congruent (norms and pairwise
  *    cosines exact), cross-replica similarity is scrambled. The n3
  *    query set (vec_id < 32) lives only in replica 0, unchanged.
  */
object ScaleRehearsal {

  val Replicas = 10
  /** Multiple of DedupOps.DecontamEvalMod so the eval slice replicates. */
  val DocIdOffset = 1000000L
  val VecIdOffset = 1000000L

  private val lower = "abcdefghijklmnopqrstuvwxyz"

  /** Caesar-cipher words of length ≥ 4, rotation k per replica. */
  private[graft] def cipherDocs(docs: DataFrame, replica: Int): DataFrame = {
    require(replica >= 1 && replica <= 25)
    val rotL = lower.drop(replica) + lower.take(replica)
    val from = lower + lower.toUpperCase
    val to = rotL + rotL.toUpperCase
    docs
      .withColumn("doc_id", col("doc_id") + lit(replica * DocIdOffset))
      .withColumn("text", array_join(
        transform(split(col("text"), " "),
          w => when(length(w) <= 3, w).otherwise(translate(w, from, to))),
        " "))
  }

  /** Seeded per-replica dimension permutation + sign flip (orthogonal,
    * so norms and within-replica cosines are preserved exactly). */
  private[graft] def perturbEmbeddings(emb: DataFrame, replica: Int,
      dim: Int): DataFrame = {
    val rnd = new scala.util.Random(7000 + replica)
    val perm = rnd.shuffle((1 to dim).toVector) // 1-based for element_at
    val signs = Vector.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val permCol = array(perm.map(lit): _*)
    val signCol = array(signs.map(lit): _*)
    emb
      .withColumn("vec_id", col("vec_id") + lit(replica * VecIdOffset))
      .withColumn("embedding",
        transform(sequence(lit(1), lit(dim)), j =>
          element_at(col("embedding"), element_at(permCol, j).cast("int"))
            * element_at(signCol, j)))
  }

  /** Build the 10× corpus under `out` (skipped if already built). Only
    * documents + embeddings scale — they are the only tables the
    * rehearsed queries read. */
  def buildCorpus(spark: SparkSession, src: String, out: String): Unit = {
    val marker = new java.io.File(out, "_BUILT")
    if (marker.exists()) return
    val docs = graft.core.Tables.documents(spark, src)
    val emb = graft.core.Tables.embeddings(spark, src)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val docsAll = (1 until Replicas)
      .map(cipherDocs(docs, _)).foldLeft(docs)(_ unionByName _)
    val embAll = (1 until Replicas)
      .map(perturbEmbeddings(emb, _, dim)).foldLeft(emb)(_ unionByName _)
    docsAll.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    embAll.repartition(8).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    marker.getParentFile.mkdirs()
    marker.createNewFile()
    ()
  }

  /** The heavyweight set the verdict asked to rehearse, plus n7 (the
    * iterative cluster resolution over n2's pairs — its rounds are the
    * new scale dimension). */
  val Heavyweights = Seq(
    "llm1_prep_counts", "n2_ngram_jaccard", "n2b_minhash_lsh",
    "n3_cosine_topk", "n3b_srp_ann", "n3c_ivf_ann", "n3d_ivf2_ann",
    "n3e_ann_incremental", "n5_embed_neardup", "n7_dup_clusters",
    // timing-only at 10×: t8's short-word bigrams and n8's embedding
    // pairs cross replicas, so their VALUES legitimately differ from
    // 10× the base (corpus-trained LM counts / merged components) —
    // the vs-linear cost curve is the rehearsed property
    "n8_semantic_clusters", "t8_bigram_lm")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("target/scale/sf1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildCorpus(spark, src, out)

    // --- correctness at scale: exact pipelines must scale EXACTLY 10× ---
    def stageCounts(dir: String): Map[String, Long] =
      SparkEntry.queries("llm1_prep_counts")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = stageCounts(src)
    val scaled = stageCounts(out)
    val llmOk = base.forall { case (k, v) => scaled.get(k).contains(v * 10) }
    val n2Base = SparkEntry.queries("n2_ngram_jaccard")(spark, src).count()
    val n2Scaled = SparkEntry.queries("n2_ngram_jaccard")(spark, out).count()
    val annRows = Seq("n3_cosine_topk", "n3b_srp_ann", "n3c_ivf_ann",
      "n3d_ivf2_ann", "n3e_ann_incremental").map { q =>
      q -> SparkEntry.queries(q)(spark, out).count()
    }
    val n5Base = SparkEntry.queries("n5_embed_neardup")(spark, src).count()
    val n5Scaled = SparkEntry.queries("n5_embed_neardup")(spark, out).count()
    System.err.println(s"[rehearsal] llm1 counts 10x exact: $llmOk " +
      s"(base=$base scaled=$scaled)")
    System.err.println(s"[rehearsal] n2 pairs: base=$n2Base scaled=$n2Scaled" +
      s" exact10x=${n2Scaled == 10 * n2Base}")
    System.err.println(s"[rehearsal] ann rows (expect 320 each): " +
      annRows.map { case (q, n) => s"$q=$n" }.mkString(" "))
    System.err.println(s"[rehearsal] n5 pairs: base=$n5Base scaled=$n5Scaled" +
      " (SRP recall at rescaled bits; report-only)")
    require(llmOk, "llm1 stage counts did not scale exactly 10x")
    require(n2Scaled == 10 * n2Base, "n2 pair count did not scale exactly 10x")
    require(annRows.forall(_._2 == 320L), "an ANN query lost top-k rows")
    // n7: pairs are within-replica only, so clusters (and their member
    // rows) replicate exactly 10×
    val n7Base = SparkEntry.queries("n7_dup_clusters")(spark, src).count()
    val n7Scaled = SparkEntry.queries("n7_dup_clusters")(spark, out).count()
    System.err.println(s"[rehearsal] n7 clustered docs: base=$n7Base " +
      s"scaled=$n7Scaled exact10x=${n7Scaled == 10 * n7Base}")
    require(n7Scaled == 10 * n7Base,
      "n7 clustered-doc count did not scale exactly 10x")
    // n8/t8 are timing-only (cross-replica pairs / shared short-word
    // bigrams shift their values off 10×) but must still join the
    // verification pass's WARM-UP role: without this, a REPS=1 run
    // would time their first-ever execution (plan compile + memo
    // bring-up) and skew vs_linear for exactly these two queries
    Seq("n8_semantic_clusters", "t8_bigram_lm").foreach { q =>
      val b = SparkEntry.queries(q)(spark, src).count()
      val s = SparkEntry.queries(q)(spark, out).count()
      System.err.println(s"[rehearsal] $q rows: base=$b scaled=$s " +
        "(timing-only, values legitimately off 10x)")
    }

    // --- timing: interleaved min-of-reps at both scales, same JVM -------
    // (the verification pass above doubles as warm-up: every model
    // memo — codebooks, split points, published index stores — is built
    // before the first timed rep at both scales)
    val samples = (1 to reps).flatMap { _ =>
      Heavyweights.flatMap { name =>
        Seq(src, out).map { dir =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir).count()
          ((name, dir), (System.nanoTime() - t0) / 1e9)
        }
      }
    }
    val mins = samples.groupBy(_._1).map { case (k, s) =>
      k -> s.map(_._2).min }
    val lines = Heavyweights.map { name =>
      val b = mins((name, src)); val s = mins((name, out))
      val linear = s / (b * Replicas)
      f"""{"query":"$name","sf01_sec":$b%.3f,"sf1_sec":$s%.3f,""" +
        f""""ratio":${s / b}%.2f,"vs_linear":$linear%.2f}"""
    }
    lines.foreach(println)
    val verdictLine = Heavyweights.map { name =>
      val l = mins((name, out)) / (mins((name, src)) * Replicas)
      f"$name=${l}%.2f"
    }.mkString(" ")
    System.err.println(s"[rehearsal] vs-linear (<2.0 required): $verdictLine")
    spark.stop()
  }
}
