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
  *  3. diff the source over the interval — appended rows via
  *     [[AtomicPublish.changesSince]]; when tombstones landed too, the
  *     full CDC feed [[AtomicPublish.changesWithDeletes]] adds the
  *     DELETED rows (read through the skipping layers: the interval's
  *     delete keys prune the history scan);
  *  4. SIGNED MERGE (the counting algorithm of incremental
  *     view-maintenance literature): aggregate only the inserted rows
  *     (+1) and deleted rows (−1) and fold them into the current
  *     state. sum/count subtract exactly; a hidden companion table
  *     (`<view>_aux`) carries per-group row counts (`__rows`) and
  *     per-sum non-null counts (`__n_<col>`) so a group whose rows all
  *     die DISAPPEARS (not "sticks at zero") and a sum whose surviving
  *     values are all null goes back to NULL — both exactly what the
  *     recompute would produce. min/max cannot be un-merged, so a
  *     delete in the interval sends views containing them down the
  *     full-recompute fallback;
  *  5. publish the merged view, its aux state AND the advanced
  *     watermark in ONE replace delta with `parent = T` — the CAS
  *     rejects the commit if anything moved, so view, aux and
  *     watermark can never drift apart (the torn state "view updated,
  *     watermark stale" is unrepresentable).
  *
  * The aggregate spec is restricted to ALGEBRAIC functions (sum, count,
  * min, max) — exactly the class mergeable from partial states without
  * re-reading inputs; avg is `sum/count` at read time (and therefore
  * delete-maintainable). Reference analog: none (the reference
  * recomputes summaries per request, routes.py:68-78); this is the
  * steady-state shape its dashboards would need at scale.
  */
object MatView {

  /** One aggregate column: `fn` over source column `col`, emitted as
    * `as`. `fn ∈ {sum, count, min, max}`. */
  final case class Agg(fn: String, col: String, as: String)

  /** View definition: group the source table by `keys`, aggregate per
    * [[Agg]]. The view table, its hidden merge state and its watermark
    * live beside the source in the same store root (`<view>` +
    * `<view>_aux` + `<view>_wm`). */
  final case class Def(src: String, view: String, keys: Seq[String],
      aggs: Seq[Agg]) {
    require(aggs.nonEmpty, "a materialized view needs at least one aggregate")
    aggs.foreach(a => require(Set("sum", "count", "min", "max")(a.fn),
      s"aggregate '${a.fn}' is not algebraic-mergeable " +
        "(sum/count/min/max)"))
    (keys ++ aggs.map(_.as)).foreach(n => require(!n.startsWith("__"),
      s"view column '$n': the '__' prefix is reserved for merge state"))
    def wmTable: String = s"${view}_wm"
    def auxTable: String = s"${view}_aux"
    /** Deletes are signed-mergeable iff no agg is min/max. */
    def deleteMaintainable: Boolean =
      aggs.forall(a => a.fn == "sum" || a.fn == "count")
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

  /** Hidden merge state: the group's live row count, plus the non-null
    * input count behind every sum (a sum is NULL iff that count is 0 —
    * signed arithmetic alone would leave 0 where the recompute says
    * null). */
  private def auxCols(d: Def): Seq[Column] =
    count(lit(1)).as("__rows") +:
      d.aggs.filter(_.fn == "sum")
        .map(a => count(col(a.col)).as(s"__n_${a.as}"))

  private def auxNames(d: Def): Seq[String] =
    "__rows" +: d.aggs.filter(_.fn == "sum").map(a => s"__n_${a.as}")

  /** One aggregation pass producing BOTH the public agg columns and the
    * hidden merge state. */
  private def aggregateAll(d: Def, rows: DataFrame): DataFrame = {
    val cs = aggCols(d) ++ auxCols(d)
    rows.groupBy(d.keys.map(col): _*).agg(cs.head, cs.tail: _*)
  }

  private def viewOf(d: Def, combined: DataFrame): DataFrame =
    combined.select((d.keys ++ d.aggs.map(_.as)).map(col): _*)

  /** The SIGNED MERGE: current state (+), inserted-rows aggregate (+),
    * deleted-rows aggregate (−), folded per group in ONE merge
    * aggregation (union with a sign column — no joins, null group keys
    * merge exactly like the recompute's groupBy). Groups whose signed
    * row count reaches 0 vanish; sums whose signed non-null count
    * reaches 0 become null. `minus` must be empty unless
    * [[Def.deleteMaintainable]]. */
  private def signedMerge(d: Def, cur: DataFrame, plus: DataFrame,
      minus: Option[DataFrame]): DataFrame = {
    val signed = cur.withColumn("__sign", lit(1L))
      .unionByName(plus.withColumn("__sign", lit(1L)))
      .unionByName(minus.map(_.withColumn("__sign", lit(-1L)))
        .getOrElse(plus.limit(0).withColumn("__sign", lit(1L))))
    val mergeCols: Seq[Column] = d.aggs.map { a =>
      a.fn match {
        case "sum" | "count" => sum(col(a.as) * col("__sign")).as(a.as)
        // min/max only reach here on the append path (minus empty):
        // partial mins/maxes fold; null partials (all-null group slices)
        // are ignored by the agg exactly like the recompute ignores
        // null inputs
        case "min" => min(col(a.as)).as(a.as)
        case "max" => max(col(a.as)).as(a.as)
      }
    } ++ auxNames(d).map(n => sum(col(n) * col("__sign")).as(n))
    val merged = signed.groupBy(d.keys.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
      .filter(col("__rows") > 0)
    // null-fix the sums, restore the declared column types (sum-based
    // merging widens int counts legally — counts are long already —
    // but a sum over ints re-sums as long: cast back via the plus
    // frame's schema, which carries the canonical aggregate types)
    val canon = plus.schema
    val projected = (d.keys ++ d.aggs.map(_.as) ++ auxNames(d)).map { n =>
      val c = d.aggs.find(x => x.as == n && x.fn == "sum") match {
        case Some(_) =>
          when(col(s"__n_$n") === 0, lit(null)).otherwise(col(n))
        case None => col(n)
      }
      (if (canon.fieldNames.contains(n)) c.cast(canon(n).dataType) else c)
        .as(n)
    }
    merged.select(projected: _*)
  }

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
      val manifest = AtomicPublish.manifestOf(spark, root, pinned)
      def srcOwners(txn: String): (Option[Seq[String]], Option[Seq[String]]) = {
        val m = AtomicPublish.manifestOf(spark, root, txn)
        (m.get(d.src), m.get(AtomicPublish.deleteTableOf(d.src)))
      }
      def tombstonesChanged(covered: String): Boolean =
        srcOwners(covered)._2 != srcOwners(pinned)._2
      def full = aggregateAll(d,
        AtomicPublish.readTableAt(spark, root, d.src, pinned))
      // pre-aux views (and replaced sources) lack mergeable state: one
      // full recompute rebuilds it, every later refresh is incremental
      def curAux: Option[DataFrame] =
        if (!manifest.contains(d.auxTable)) None
        else Some(AtomicPublish.readTableAt(spark, root, d.auxTable, pinned))
      val merged: Option[DataFrame] = wm match {
        case Some(covered) if covered == pinned ||
            srcOwners(covered) == srcOwners(pinned) =>
          None // already current
        case Some(covered) if tombstonesChanged(covered) =>
          // deletes landed in the interval: signed-merge them when the
          // agg set allows it, otherwise recompute (min/max cannot be
          // un-merged — the documented narrowing)
          val inc =
            if (!d.deleteMaintainable) None
            else curAux.flatMap { aux =>
              AtomicPublish.changesWithDeletes(spark, root, d.src,
                covered, Some(pinned)).map { case (ins, del) =>
                signedMerge(d, aux, aggregateAll(d, ins),
                  Some(aggregateAll(d, del)))
              }
            }
          Some(inc.getOrElse(full))
        case Some(covered) =>
          AtomicPublish.changesSince(spark, root, d.src, covered,
            Some(pinned)) match {
            case Some(delta) =>
              // O(changed): aggregate the delta only, merge with the
              // current state — history segments never re-read
              curAux match {
                case Some(aux) =>
                  Some(signedMerge(d, aux, aggregateAll(d, delta), None))
                case None => Some(full)
              }
            case None =>
              // the source was REPLACED in the interval (compaction /
              // corpus maintenance): incremental diffing cannot see a
              // rewrite, recompute from the pinned snapshot
              Some(full)
          }
        case None => Some(full)
      }
      merged match {
        case None => return None
        case Some(combined0) =>
          // one computation feeds two published frames
          val combined = combined0.cache()
          try {
            AtomicPublish.publishDelta(spark, root, append = Map.empty,
              replace = Map(
                d.view -> viewOf(d, combined),
                d.auxTable -> combined,
                d.wmTable -> Seq(pinned).toDF("covered_txn")),
              parent = Some(pinned)) match {
              case Some(txn) => return Some(txn)
              case None => () // a publisher won the race: re-pin, retry
            }
          } finally combined.unpersist()
      }
    }
    throw new IllegalStateException(
      s"matview '${d.view}' lost the commit race $maxAttempts times")
  }

  /** CONTINUOUS refresh: subscribe to the store's change feed
    * (`readStream.format("graft")` over the source table) and bring
    * the view current once per commit interval — the event-driven
    * replacement for a caller-scheduled polling loop. The microbatch
    * frame itself is only the wake-up signal; [[refresh]] re-reads the
    * store under its own pinned txn and CAS, so delivery semantics
    * (at-least-once foreachBatch) cannot corrupt the view. If the
    * source is compacted/replaced mid-stream the query fails with
    * [[graft.streaming.GraftChangeFeedSource.ResyncRequired]]; the
    * caller's supervision loop runs one batch [[refresh]] (which
    * handles the replace by recompute) and restarts from a fresh
    * checkpoint. */
  def streamRefresh(spark: SparkSession, root: String, d: Def,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft")
      .option("root", root).option("table", d.src).load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refresh(spark, root, d); ()
      }
      .start()

  /** The reference answer: the same aggregate computed from scratch
    * over the source at `txn` — what every refresh path must equal. */
  def recomputed(spark: SparkSession, root: String, d: Def,
      txn: String): DataFrame =
    aggregate(d, AtomicPublish.readTableAt(spark, root, d.src, txn))

  private def aggregate(d: Def, rows: DataFrame): DataFrame =
    rows.groupBy(d.keys.map(col): _*)
      .agg(aggCols(d).head, aggCols(d).tail: _*)
}
