package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.analytics.SimilarityOps
import graft.ops.AtomicPublish

/** Streaming ANN-index ingest: per-trigger atomic deltas into the
  * cell-partitioned published IVF index, exactly-once content under
  * replay, and equivalence with a one-shot batch build. */
class VecIngestSpec extends SparkSuite {
  import spark.implicits._

  // four orthogonal centroids: assignment is exact and deterministic
  // (cosine 1.0 to the aligned centroid, 0.0 to every other)
  private def centroids: DataFrame = Seq(
    (0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)),
    (2, Seq(0.0, 0.0, 1.0, 0.0)), (3, Seq(0.0, 0.0, 0.0, 1.0)))
    .toDF("cell", "c")

  private def vec(i: Long): (Long, Seq[Double]) = {
    val v = Array(0.0, 0.0, 0.0, 0.0)
    v((i % 4).toInt) = 1.0 + i // scale never changes the cosine argmax
    i -> v.toSeq
  }

  test("streamed index ≡ one-shot build; replays admit zero; layout partitioned") {
    val root = Files.createTempDirectory("vec-ingest").resolve("index").toString
    val src = Files.createTempDirectory("vec-ingest-src")
    // b0: 0..19; b1: replay of 0..4 + new 20..29; b2: PURE replay
    val batches = Seq(
      (0L until 20L).map(vec),
      (0L until 5L).map(vec) ++ (20L until 30L).map(vec),
      (10L until 20L).map(vec))
    batches.zipWithIndex.foreach { case (vs, i) =>
      val d = Files.createTempDirectory(s"vec-ingest-stage$i")
      vs.toDF("vec_id", "v").coalesce(1).write.parquet(d.resolve("p").toString)
      val dst = src.resolve(f"b$i.parquet")
      Files.copy(firstFile(d.resolve("p")), dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 30000 + i * 10000))
      ()
    }
    val stream = spark.readStream
      .schema("vec_id LONG, v ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString)
    VecIngest.indexStream(stream, root, centroids).awaitTermination()

    val idx = AtomicPublish.readTable(spark, root, "ivf_index")
    // exactly-once content: every distinct vec_id once, assigned to its
    // aligned cell
    val got = idx.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(got.keySet == (0L until 30L).toSet)
    got.foreach { case (id, cell) => assert(cell == (id % 4).toInt) }
    // equivalence with a one-shot batch build over the union
    val oneShot = SimilarityOps.assignCells(
        batches.flatten.distinct.toDF("vec_id", "v")
          .withColumn("nrm", sqrt(graft.functions.VectorFunctions
            .dot(col("v"), col("v")))),
        centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(got == oneShot)
    // the pure-replay trigger published NOTHING: two owner segments
    val txn = AtomicPublish.currentTxn(spark, root).get
    val meta = AtomicPublish.manifestMetaOf(spark, root, txn)("ivf_index")
    assert(meta.owners.size == 2, s"owners=${meta.owners}")
    // first append decided the cell-partitioned layout; a cell filter
    // prunes the store read to that cell's partitions
    assert(meta.partitionCols == Seq("cell"))
    val pruned = idx.filter(col("cell") === 2)
    pruned.collect()
    val plan = (pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
  }

  test("auto-compaction bounds a long-running index ingest; layout survives") {
    val root = Files.createTempDirectory("vec-ingest3").resolve("index").toString
    (0 until 20).foreach { b =>
      VecIngest.indexBatch(spark, root,
        (b * 8L until (b + 1) * 8L).map(vec).toDF("vec_id", "v"), centroids)
    }
    val txn = AtomicPublish.currentTxn(spark, root).get
    val meta = AtomicPublish.manifestMetaOf(spark, root, txn)("ivf_index")
    assert(meta.owners.size <= VecIngest.AutoCompactOwners + 1,
      s"owners=${meta.owners.size}")
    assert(meta.partitionCols == Seq("cell"))
    val idx = AtomicPublish.readTable(spark, root, "ivf_index")
    assert(idx.count() == 160)
    assert(idx.select("vec_id").as[Long].collect().toSet ==
      (0L until 160L).toSet)
  }

  test("batch backfill entry returns None on a fully-published batch") {
    val root = Files.createTempDirectory("vec-ingest2").resolve("index").toString
    val first = VecIngest.indexBatch(spark, root,
      (0L until 8L).map(vec).toDF("vec_id", "v"), centroids)
    assert(first.isDefined)
    val replay = VecIngest.indexBatch(spark, root,
      (0L until 8L).map(vec).toDF("vec_id", "v"), centroids)
    assert(replay.isEmpty)
    assert(AtomicPublish.readTable(spark, root, "ivf_index").count() == 8)
  }

  test("re-embed upsert: latest vector wins, cells move, replays publish nothing") {
    val root = Files.createTempDirectory("vec-reembed").resolve("index").toString
    val v0 = VecIngest.indexBatch(spark, root,
      (0L until 12L).map(vec).toDF("vec_id", "v"), centroids).get
    // re-embed vec 5 (cell 1) into cell 2's direction, and vec 6 with
    // an identical vector (must be skipped)
    val re = Seq(
      5L -> Seq(0.0, 0.0, 9.0, 0.0),
      6L -> vec(6L)._2).toDF("vec_id", "v")
    val t1 = VecIngest.reembedBatch(spark, root, re, centroids)
    assert(t1.isDefined)
    val idx = AtomicPublish.readTable(spark, root, "ivf_index")
    assert(idx.count() == 12) // still one live row per vec_id
    val r5 = idx.where("vec_id = 5").head()
    assert(r5.getAs[Int]("cell") == 2, "re-embedded vector moved cell")
    assert(r5.getSeq[Double](r5.fieldIndex("v")).toSeq ==
      Seq(0.0, 0.0, 9.0, 0.0))
    // time travel: the pre-re-embed index still serves the old vector
    assert(AtomicPublish.readTableAt(spark, root, "ivf_index", v0)
      .where("vec_id = 5").head().getAs[Int]("cell") == 1)
    // replaying the exact re-embed batch publishes nothing
    assert(VecIngest.reembedBatch(spark, root, re, centroids).isEmpty)
    // physical apply: compaction retires the old version for good
    graft.ops.Compaction.compactStore(spark, root, "ivf_index")
    val after = AtomicPublish.readTable(spark, root, "ivf_index")
    assert(after.count() == 12)
    assert(after.where("vec_id = 5").head().getAs[Int]("cell") == 2)
  }
}
