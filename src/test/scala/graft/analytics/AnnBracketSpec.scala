package graft.analytics

import org.apache.spark.sql.Row

import graft.SparkSuite

/** The ANN bracket wrapper (VERDICT r10 ask #3): n3b/n3c/n3f ride the
  * hash gate as exact top-k rows + engine-computed booleans. The gate
  * itself proves the flags land true; this spec proves the flags CAN
  * fail — a bracket that cannot flip would be decoration. */
class AnnBracketSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("bracket flags are true at the declared floors for all three variants") {
    Seq(
      SimilarityOps.n3bSrpAnnBracket(spark, dir),
      SimilarityOps.n3cIvfAnnBracket(spark, dir),
      SimilarityOps.n3fIvfPqAnnBracket(spark, dir)
    ).foreach { df =>
      val rows = df.collect()
      assert(rows.length == SimilarityOps.QueryCount * SimilarityOps.TopK)
      rows.foreach { case Row(_, _, _, _, recallOk: Boolean, simsOk: Boolean) =>
        assert(recallOk && simsOk)
      }
      // the hashed payload IS the exact top-k
      val exact = SimilarityOps.n3CosineTopk(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val payload = rows.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(payload.sameElements(exact))
    }
  }

  test("an unreachable recall floor flips the hashed boolean (the bracket can fail)") {
    val strict = SimilarityOps.annBracket(spark, dir,
      SimilarityOps.n3bSrpAnn(spark, dir), recallFloor = 1.01)
    val flags = strict.select("recall_ok", "sims_ok").distinct().collect()
    assert(flags.length == 1)
    assert(!flags.head.getBoolean(0), "recall_ok should have flipped false")
    assert(flags.head.getBoolean(1), "sims_ok is independent and stays true")
  }
}
