package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order clustering: the Morton interleave is exact arithmetic, and
  * the clustered layout gives EVERY dimension file-pruning power —
  * the property lexicographic clustering only grants its leading
  * column. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("morton interleave arithmetic: hand-computed keys") {
    // buckets (3, 5): 3 = 011b contributes bits at positions 0 and 2,
    // 5 = 101b at positions 1 and 5 → z = 1 + 4 + 2 + 32 = 39
    val row = Seq((3, 5)).toDF("a", "b")
      .select(ZOrder.zCol(Seq(col("a"), col("b"))).as("z"))
      .head()
    assert(row.getLong(0) == 39L)
    // interleave is monotone per dimension holding the other fixed
    val z0 = Seq((0, 7)).toDF("a", "b")
      .select(ZOrder.zCol(Seq(col("a"), col("b")))).head().getLong(0)
    val z1 = Seq((1, 7)).toDF("a", "b")
      .select(ZOrder.zCol(Seq(col("a"), col("b")))).head().getLong(0)
    assert(z1 > z0)
  }

  test("bucketCol: monotone rank map, nulls to bucket 0") {
    val bs = (1 until ZOrder.Buckets).map(_.toDouble)
    val out = Seq[java.lang.Double](0.5, 1.0, 128.7, 300.0, null)
      .toDF("v")
      .select(ZOrder.bucketCol(col("v"), bs).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 1, 128, 255, 0))
  }

  test("z-order clustering prunes files on EVERY clustered dimension") {
    val zroot = Files.createTempDirectory("zorder").resolve("t").toString
    val lroot = Files.createTempDirectory("lexo").resolve("t").toString
    val grid: DataFrame = spark.range(80L * 80L)
      .select((col("id") % 80).as("x"), (col("id") / 80).cast("long").as("y"),
        (col("id") * 31 % 997).as("v"))
    Seq(zroot, lroot).foreach { r =>
      AtomicPublish.publish(spark, r, Map("t" -> grid.repartition(4)),
        statsBy = Map("t" -> Seq("x", "y")))
    }
    val bytes = Compaction.storeTableBytes(spark, zroot, "t",
      AtomicPublish.currentTxn(spark, zroot).get)
    val target = math.max(bytes / 16, 1L) // force ~16 output files
    val (ztxn, zparts) = Compaction.compactStore(spark, zroot, "t",
      targetBytes = target, clusterBy = Seq("x", "y"), zOrder = true)
    val (_, lparts) = Compaction.compactStore(spark, lroot, "t",
      targetBytes = target, clusterBy = Seq("x", "y"))
    assert(zparts >= 8 && lparts >= 8)
    def files(root: String, pred: String): Int =
      AtomicPublish.readTableWhere(spark, root, "t", pred)
        .inputFiles.length
    val zTotal = AtomicPublish.manifestMetaOf(spark, zroot, ztxn)("t")
      .fileStats(ztxn).size
    // z-order: BOTH dimensions prune to a strict subset
    val zx = files(zroot, "x = 40"); val zy = files(zroot, "y = 40")
    assert(zx < zTotal && zx <= zTotal / 2, s"x: $zx of $zTotal")
    assert(zy < zTotal && zy <= zTotal / 2, s"y: $zy of $zTotal")
    // lexicographic: the leading column prunes hard, the trailing one
    // cannot prune at all (every file spans the full y range)
    val lTotal = files(lroot, "x >= 0 OR x < 0") // tautology: all files
    val lx = files(lroot, "x = 40"); val ly = files(lroot, "y = 40")
    assert(lx <= 2)
    assert(ly == lTotal, s"lexicographic y should read all: $ly != $lTotal")
    assert(zy < ly, "z-order must beat lexicographic on the trailing dim")
    // equivalence on both layouts
    Seq(zroot, lroot).foreach { r =>
      val got = AtomicPublish.readTableWhere(spark, r, "t", "y = 40")
        .collect().toSet
      val want = AtomicPublish.readTable(spark, r, "t").where("y = 40")
        .collect().toSet
      assert(got == want && got.size == 80)
    }
  }

  test("zOrder guard rails: column count, types, flat layout") {
    val root = Files.createTempDirectory("zguard").resolve("t").toString
    AtomicPublish.publish(spark, root,
      Map("t" -> Seq((1L, "s", 2L)).toDF("a", "b", "c")),
      statsBy = Map("t" -> Seq("a")))
    intercept[IllegalArgumentException] {
      Compaction.compactStore(spark, root, "t",
        clusterBy = Seq("a"), zOrder = true) // one column
    }
    intercept[IllegalArgumentException] {
      Compaction.compactStore(spark, root, "t",
        clusterBy = Seq("a", "b"), zOrder = true) // non-numeric
    }
  }
}
