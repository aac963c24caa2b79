package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL MATERIALIZED VIEWS over the store's change feed — the
  * downstream half of the delta format: a grouped aggregate of a store
  * table, kept current in O(changed data) per refresh instead of a
  * full recompute, the way a 100 TB ingest corpus keeps its per-key
  * dashboards alive without re-scanning history every time.
  *
  * Mechanics per [[refresh]]:
  *  1. pin the live txn T once;
  *  2. read the view's WATERMARK (the source txn the view already
  *     covers) from the view's companion meta table;
  *  3. `changesSince(src, watermark, T)` — the owner segments the
  *     source gained in the interval, read as one frame (history
  *     untouched);
  *  4. partially aggregate ONLY the delta, merge with the current view
  *     rows (algebraic merge: sum+sum, count+count, min/min, max/max —
  *     sound because the source evolves append-only; a REPLACE in the
  *     interval surfaces as `changesSince = None` and triggers the
  *     full-recompute fallback);
  *  5. publish the merged view AND the advanced watermark in ONE
  *     replace delta with `parent = T` — the CAS rejects the commit if
  *     anything moved, so view and watermark can never drift apart
  *     (the torn state "view updated, watermark stale" is
  *     unrepresentable).
  *
  * The aggregate spec is restricted to ALGEBRAIC functions (sum, count,
  * min, max) — exactly the class mergeable from partial states without
  * re-reading inputs; avg is `sum/count` at read time. Reference
  * analog: none (the reference recomputes summaries per request,
  * routes.py:68-78); this is the steady-state shape its dashboards
  * would need at scale.
  */
object MatView {

  /** One aggregate column: `fn` over source column `col`, emitted as
    * `as`. `fn ∈ {sum, count, min, max}`. */
  final case class Agg(fn: String, col: String, as: String)

  /** View definition: group the source table by `keys`, aggregate per
    * [[Agg]]. The view table and its watermark live beside the source
    * in the same store root (`<view>` + `<view>_wm`). */
  final case class Def(src: String, view: String, keys: Seq[String],
      aggs: Seq[Agg]) {
    require(aggs.nonEmpty, "a materialized view needs at least one aggregate")
    aggs.foreach(a => require(Set("sum", "count", "min", "max")(a.fn),
      s"aggregate '${a.fn}' is not algebraic-mergeable " +
        "(sum/count/min/max)"))
    def wmTable: String = s"${view}_wm"
  }

  private def aggCols(d: Def): Seq[Column] = d.aggs.map { a =>
    val c = a.fn match {
      case "sum" => sum(col(a.col))
      case "count" => count(col(a.col))
      case "min" => min(col(a.col))
      case "max" => max(col(a.col))
    }
    c.as(a.as)
  }

  /** The merge of two partial states carried in `as`-named columns:
    * sum/count add, min/max fold. Null-safe: a key present on only one
    * side keeps that side's state (coalesce), matching what the
    * aggregate over the union would produce. */
  private def mergeCols(d: Def): Seq[Column] = d.aggs.map { a =>
    val l = col(s"l.${a.as}"); val r = col(s"r.${a.as}")
    val m = a.fn match {
      case "sum" | "count" =>
        when(l.isNull, r).when(r.isNull, l).otherwise(l + r)
      case "min" => when(l.isNull, r).when(r.isNull, l)
        .otherwise(least(l, r))
      case "max" => when(l.isNull, r).when(r.isNull, l)
        .otherwise(greatest(l, r))
    }
    m.as(a.as)
  }

  private def aggregate(d: Def, rows: DataFrame): DataFrame =
    rows.groupBy(d.keys.map(col): _*)
      .agg(aggCols(d).head, aggCols(d).tail: _*)

  /** The view's covered source txn at `atTxn` (None = view not yet
    * initialized). */
  def watermark(spark: SparkSession, root: String, d: Def,
      atTxn: Option[String] = None): Option[String] = {
    val txn = atTxn.orElse(AtomicPublish.currentTxn(spark, root))
      .getOrElse(return None)
    val manifest = AtomicPublish.manifestOf(spark, root, txn)
    if (!manifest.contains(d.wmTable)) None
    else Some(AtomicPublish.readTableAt(spark, root, d.wmTable, txn)
      .select("covered_txn").head().getString(0))
  }

  /** Bring the view current with the live source. Returns the txn of
    * the refresh commit, or None when the view is already current
    * (nothing published — repeated refreshes of a quiet store are
    * free). Retries the CAS a bounded number of times against
    * concurrent publishers. */
  def refresh(spark: SparkSession, root: String, d: Def,
      maxAttempts: Int = 5): Option[String] = {
    import spark.implicits._
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val pinned = AtomicPublish.currentTxn(spark, root).getOrElse(
        throw new IllegalStateException(s"no published version under $root"))
      val wm = watermark(spark, root, d, Some(pinned))
      // "already current" means the SOURCE is unchanged since the
      // covered txn — not that the txns are equal: the refresh commit
      // itself advances the live txn, and comparing txns alone would
      // make every refresh republish an unchanged view forever. The
      // source's TOMBSTONE table counts as part of the source: a
      // delete changes the aggregate without adding a segment
      def srcOwners(txn: String): (Option[Seq[String]], Option[Seq[String]]) = {
        val m = AtomicPublish.manifestOf(spark, root, txn)
        (m.get(d.src), m.get(AtomicPublish.deleteTableOf(d.src)))
      }
      // deletes are not incrementally mergeable (min/max cannot be
      // un-merged): a tombstone change in the interval forces the
      // full-recompute path, which reads the live (anti-joined) rows
      def tombstonesChanged(covered: String): Boolean =
        srcOwners(covered)._2 != srcOwners(pinned)._2
      val merged: Option[DataFrame] = wm match {
        case Some(covered) if covered == pinned ||
            srcOwners(covered) == srcOwners(pinned) =>
          None // already current
        case Some(covered) if tombstonesChanged(covered) =>
          Some(aggregate(d,
            AtomicPublish.readTableAt(spark, root, d.src, pinned)))
        case Some(covered) =>
          AtomicPublish.changesSince(spark, root, d.src, covered,
            Some(pinned)) match {
            case Some(delta) =>
              // O(changed): aggregate the delta only, merge with the
              // current view state — history segments never re-read.
              // The join is NULL-SAFE per key (<=>): a null-keyed group
              // must merge into ONE row the way the recompute's groupBy
              // treats nulls, not duplicate per refresh
              val cur = AtomicPublish.readTableAt(spark, root, d.view,
                pinned)
              val part = aggregate(d, delta)
              val cond = d.keys.map(k => col(s"l.$k") <=> col(s"r.$k"))
                .reduce(_ && _)
              Some(cur.as("l").join(part.as("r"), cond, "full_outer")
                .select(d.keys.map(k =>
                  coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) ++
                  mergeCols(d): _*))
            case None =>
              // the source was REPLACED in the interval (compaction /
              // corpus maintenance): incremental diffing cannot see a
              // rewrite, recompute from the pinned snapshot
              Some(aggregate(d,
                AtomicPublish.readTableAt(spark, root, d.src, pinned)))
          }
        case None =>
          Some(aggregate(d,
            AtomicPublish.readTableAt(spark, root, d.src, pinned)))
      }
      merged match {
        case None => return None
        case Some(view) =>
          AtomicPublish.publishDelta(spark, root, append = Map.empty,
            replace = Map(
              d.view -> view,
              d.wmTable -> Seq(pinned).toDF("covered_txn")),
            parent = Some(pinned)) match {
            case Some(txn) => return Some(txn)
            case None => () // a publisher won the race: re-pin, retry
          }
      }
    }
    throw new IllegalStateException(
      s"matview '${d.view}' lost the commit race $maxAttempts times")
  }

  /** The reference answer: the same aggregate computed from scratch
    * over the source at `txn` — what every refresh path must equal. */
  def recomputed(spark: SparkSession, root: String, d: Def,
      txn: String): DataFrame =
    aggregate(d, AtomicPublish.readTableAt(spark, root, d.src, txn))
}
