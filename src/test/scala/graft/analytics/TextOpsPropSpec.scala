package graft.analytics

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check => scCheck, Parameters}

import graft.SparkSuite

/** Property-based check of t6's repetition signals against a direct
  * Scala re-computation over generated word-salad documents — the same
  * engine-independent-reference technique the ingestion prop spec uses.
  * Samples are few and small: each one runs a real Spark job. */
class TextOpsPropSpec extends SparkSuite {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)

  private val genDoc: Gen[List[String]] = for {
    n <- Gen.choose(2, 30) // ≥2 words so every doc has a bigram row
    vocab <- Gen.choose(1, 5)
    ws <- Gen.listOfN(n, Gen.choose(0, vocab - 1).map(i => s"w$i"))
  } yield ws

  test("t6 matches a direct recomputation on arbitrary word salads") {
    val prop: Prop = forAll(Gen.listOfN(4, genDoc)) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextOps.t6RepetitionOn(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      docs.zipWithIndex.forall { case (ws, i) =>
        val nWords = ws.length.toLong
        val nDistinct = ws.distinct.length.toLong
        val bgs = ws.sliding(2).map(_.mkString(" ")).toList
        val top = bgs.groupBy(identity).values.map(_.length).max.toLong
        val nBg = bgs.length.toLong
        got(i.toLong) == ((nWords, nDistinct, nDistinct * 10000 / nWords,
          top, nBg, top * 10000 / nBg))
      }
    }
    val res = scCheck(params, prop)
    assert(res.passed, res.status.toString)
  }
}
