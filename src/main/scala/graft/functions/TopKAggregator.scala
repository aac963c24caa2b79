package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass top-K aggregator (SURVEY.md §2.9's
  * `Aggregator[IN,BUF,OUT]` extension point).
  *
  * The window formulation of per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`) sorts EVERY
  * group member on the shuffled side before discarding all but k. This
  * aggregator keeps a bounded k-element buffer per group through the
  * map-side partial aggregation, so the shuffle carries at most k
  * entries per group per partition instead of the whole group — the
  * difference between shuffling top-3 summaries and shuffling every
  * order a customer ever placed at 100 TB.
  *
  * Ordering: value DESC, id ASC — ties resolve identically to the
  * window+row_number oracle formulation, keeping results deterministic
  * and hash-comparable. Construct where `spark.implicits._` is in scope
  * (supplies the buffer encoder).
  */
class TopKAggregator(k: Int)(implicit bufEnc: Encoder[Seq[(Double, Long)]])
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)],
                     x: (Double, Long)): Seq[(Double, Long)] = {
    val (front, back) = buf.span(e => better(e, x))
    (front ++ (x +: back)).take(k)
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
                      in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size == k && better(buf.last, in)) buf else insert(buf, in)

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = bufEnc
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufEnc
}
