package graft.functions

import graft.SparkSuite

class TopKAggregatorSpec extends SparkSuite {

  private def mkAgg(k: Int) = {
    import spark.implicits._
    new TopKAggregator(k)
  }

  test("reduce keeps k best, ordered value desc then id asc") {
    val a = mkAgg(3)
    val buf = Seq((5.0, 1L), (5.0, 2L), (3.0, 9L), (7.0, 4L), (3.0, 1L))
      .foldLeft(a.zero)(a.reduce)
    assert(buf == Seq((7.0, 4L), (5.0, 1L), (5.0, 2L)))
  }

  test("merge is order-insensitive (partial aggregation correctness)") {
    val a = mkAgg(2)
    val xs = Seq((1.0, 1L), (9.0, 2L), (9.0, 1L), (4.0, 7L))
    val (l, r) = xs.splitAt(2)
    val bufL = l.foldLeft(a.zero)(a.reduce)
    val bufR = r.foldLeft(a.zero)(a.reduce)
    assert(a.merge(bufL, bufR) == a.merge(bufR, bufL))
    assert(a.merge(bufL, bufR) == xs.foldLeft(a.zero)(a.reduce))
  }

  test("buffer never exceeds k entries (bounded shuffle state)") {
    val a = mkAgg(4)
    val buf = (1 to 1000).map(i => (i.toDouble, i.toLong))
      .foldLeft(a.zero)(a.reduce)
    assert(buf.size == 4)
    assert(buf.head == (1000.0, 1000L))
  }
}
