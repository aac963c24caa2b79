package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic multi-table publish (SURVEY.md §2.1; reference transaction
  * boundary: /root/reference/app/api/routes.py:86-148 persists patients,
  * consents, clinical, audit and run-metadata under ONE `db.commit()` at
  * :148 — a mid-request failure rolls all of them back).
  *
  * Parquet has no transactions, so the commit observable is rebuilt from
  * the two primitives a distributed FS does give us: write-to-fresh-paths
  * and atomic rename. Layout under a publish root:
  *
  * {{{
  *   root/v_<txn>/<table>/        versioned immutable table data
  *   root/_CURRENT                manifest naming the live txn + tables
  * }}}
  *
  * `publish` stages every table under a hidden scratch dir, renames the
  * whole dir to its versioned location only after ALL writes succeeded,
  * and finally swaps `_CURRENT` via an atomic overwrite-rename. Readers
  * resolve `_CURRENT` first, so they see either the complete old set of
  * tables or the complete new one — never a mix, exactly the reference's
  * all-or-nothing commit. A crash at any point leaves `_CURRENT` (and
  * everything it references) untouched; orphaned scratch/version dirs are
  * invisible garbage, reclaimed by `vacuum`. The pointer swap is atomic
  * per scheme: HDFS rename(OVERWRITE) server-side, POSIX rename(2) on the
  * local fs (where Hadoop's own overwrite-rename is a non-atomic
  * delete+rename — see the commit step).
  *
  * At 100 TB this costs what the plain writes cost: the commit step moves
  * ZERO data — one directory rename plus one small-file swap — and never
  * touches the driver with row data. (This is the same observable an
  * Iceberg/Delta-style metadata pointer provides, built on the FS alone.)
  */
object AtomicPublish {

  private val CurrentFile = "_CURRENT"
  private val CommitMarker = "_COMMITTED"

  /** One lock object per publish root (same-JVM commit serialization),
    * keyed on the FS-qualified path so spelling aliases of one root
    * ("/p", "/p/", "file:/p") share a lock. */
  private val commitLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def commitLock(spark: SparkSession, root: String): Object = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    commitLocks.getOrElseUpdate(fs.makeQualified(p).toString, new Object)
  }

  /** Txns whose scratch dirs are mid-write in THIS JVM (registered for
    * the whole publish, not just the pointer swap): vacuum must not
    * reclaim a staging dir a live publisher is still filling — deleting
    * it aborts that publish's parquet job. Cross-process in-flight
    * publishes (staging AND sealed-not-yet-committed `v_` dirs) are
    * covered by vacuum's `graceMs` window instead. */
  private val inFlight =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Manifest: txn id + table names, one line each — tiny, parse-free. */
  private def renderManifest(txn: String, tables: Seq[String]): String =
    (txn +: tables.sorted).mkString("\n")

  private def fc(spark: SparkSession, p: Path): FileContext =
    FileContext.getFileContext(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getUri,
      spark.sparkContext.hadoopConfiguration)

  /** Write `tables` as one atomic publish; returns the txn id. Any write
    * failure propagates AFTER best-effort scratch cleanup, with the
    * previously published version fully intact. */
  def publish(spark: SparkSession, root: String,
      tables: Map[String, DataFrame]): String = {
    require(tables.nonEmpty, "publish needs at least one table")
    val txn = java.util.UUID.randomUUID().toString.replace("-", "")
    val rootPath = new Path(root)
    val scratch = new Path(rootPath, s".staging_$txn")
    val versioned = new Path(rootPath, s"v_$txn")
    val ctx = fc(spark, rootPath)
    ctx.mkdir(rootPath, null, true)
    inFlight.add(txn)
    try {
      // 1. stage: all data lands under paths no reader resolves
      tables.foreach { case (name, df) =>
        df.write.mode("error").parquet(new Path(scratch, name).toString)
      }
      // 2. seal: one atomic dir rename makes the version complete-or-absent
      ctx.rename(scratch, versioned)
      // 3. commit: swap the manifest pointer atomically. On HDFS the
      // FileContext overwrite-rename is atomic server-side. Hadoop's
      // LOCAL fs implements it as delete+rename — a window where readers
      // see NO manifest and committers collide — so on the file scheme
      // the tmp manifest is written via NIO (outside the checksum layer:
      // a Hadoop-written tmp leaves an immortal .crc sidecar behind, and
      // a NIO move under a stale ._CURRENT.crc makes every subsequent
      // Hadoop read throw ChecksumException) and swapped with POSIX
      // rename(2) (ATOMIC_MOVE), which replaces in place. Same-JVM
      // committers additionally serialize per root.
      val cur = new Path(rootPath, CurrentFile)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val qualified = fs.makeQualified(cur).toUri
      val manifest = renderManifest(txn, tables.keys.toSeq)
        .getBytes(StandardCharsets.UTF_8)
      if (qualified.getScheme == "file") {
        val curNio = java.nio.file.Paths.get(qualified.getPath)
        val tmpNio = curNio.resolveSibling(s"._current_$txn")
        java.nio.file.Files.write(tmpNio, manifest)
        commitLock(spark, root).synchronized {
          // a pre-NIO publish may have left a checksum sidecar for the
          // old manifest; it would fail verification against the new one
          java.nio.file.Files.deleteIfExists(
            curNio.resolveSibling(s".$CurrentFile.crc"))
          java.nio.file.Files.move(tmpNio, curNio,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      } else {
        val tmp = new Path(rootPath, s"._current_$txn")
        val out = ctx.create(tmp,
          java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
            org.apache.hadoop.fs.CreateFlag.OVERWRITE),
          Options.CreateOpts.createParent())
        try out.write(manifest) finally out.close()
        commitLock(spark, root).synchronized {
          ctx.rename(tmp, cur, Options.Rename.OVERWRITE)
        }
      }
      // 4. mark: a `_COMMITTED` file inside the version dir records, in
      // the layout itself, that this version reached the pointer — the
      // signal vacuum uses to (a) rank retention by COMMIT order and
      // (b) distinguish published versions from sealed-but-uncommitted
      // dirs of crashed or still-running cross-process publishers.
      // Best-effort: if this write fails the publish has still
      // succeeded (the pointer moved); the version is then treated as
      // uncommitted by vacuum and reclaimed after the grace window once
      // superseded — availability of the LIVE version is never affected
      // (vacuum spares whatever the pointer names).
      try {
        val mos = fs.create(new Path(versioned, CommitMarker), true)
        try mos.write(txn.getBytes(StandardCharsets.UTF_8)) finally mos.close()
      } catch { case _: Throwable => () }
      txn
    } catch {
      case e: Throwable =>
        try ctx.delete(scratch, true) catch { case _: Throwable => () }
        try ctx.delete(new Path(rootPath, s"._current_$txn"), false)
        catch { case _: Throwable => () }
        throw e
    } finally inFlight.remove(txn)
  }

  /** The live txn id, or None before the first successful publish. */
  def currentTxn(spark: SparkSession, root: String): Option[String] = {
    val cur = new Path(root, CurrentFile)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cur)) None
    else {
      val in = fs.open(cur)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim)
      finally in.close()
    }
  }

  /** Read a table from the CURRENT version — the only resolution path
    * readers use, so partially-published data is unreachable. A reader
    * needing cross-TABLE consistency under concurrent publishers should
    * pin the txn once ([[currentTxn]]) and read every table with
    * [[readTableAt]]: two `readTable` calls can legitimately span a
    * pointer swap. */
  def readTable(spark: SparkSession, root: String, table: String): DataFrame = {
    val txn = currentTxn(spark, root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    readTableAt(spark, root, table, txn)
  }

  /** Time travel: read a table at an explicit txn. Any version not yet
    * vacuumed is immutable and fully readable — the same guarantee a
    * table-format snapshot id gives, from the layout alone. */
  def readTableAt(spark: SparkSession, root: String, table: String,
      txn: String): DataFrame =
    spark.read.parquet(new Path(new Path(root, s"v_$txn"), table).toString)

  /** Drop unreferenced version and scratch dirs, subject to a retention
    * policy so [[readTableAt]] time travel and vacuum are safe to use
    * together:
    *
    *  - `keepLast` retains the N most recently COMMITTED versions,
    *    ranked by their `_COMMITTED` marker's mtime — commit order, not
    *    seal order, so a sealed-but-never-committed orphan can neither
    *    claim a retention slot nor displace a published version. The
    *    default 1 keeps only the live version — a reader pinned to an
    *    older txn must be covered by a larger `keepLast` or by
    *    `minAgeMs`, the same contract Delta/Iceberg retention gives.
    *  - `minAgeMs` additionally spares committed versions younger than
    *    the cutoff (age = time since commit).
    *  - `graceMs` protects what might belong to a publish IN FLIGHT in
    *    another process — scratch dirs and marker-less `v_` dirs, which
    *    are indistinguishable from a publisher between seal and commit.
    *    Neither is deleted until older than max(graceMs, minAgeMs); set
    *    `graceMs` above your longest publish wall-clock (default 1 h),
    *    or 0 in tests/single-process deployments to reclaim crashed
    *    leftovers immediately. Same-JVM publishers never rely on the
    *    grace: their dirs are skipped exactly via the in-flight
    *    registry, and the commit lock serializes the pointer swap with
    *    the whole list-and-delete (stress-raced in AtomicPublishSpec).
    *
    * Returns the deleted paths. The pointer is additionally re-read
    * after listing, and any version named by either read survives. A
    * version whose marker write failed (crash in the post-swap window)
    * degrades to the marker-less case: protected while live or young,
    * reclaimable once aged — never able to brick the live store. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1,
      minAgeMs: Long = 0L, graceMs: Long = 3600L * 1000): Seq[String] = {
    require(keepLast >= 1, "keepLast must retain at least the live version")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Nil
    commitLock(spark, root).synchronized {
      val liveBefore = currentTxn(spark, root)
      val statuses = fs.listStatus(rootPath).toSeq
      val liveAfter = currentTxn(spark, root) // cross-process commit guard
      val live = (liveBefore ++ liveAfter).map(t => s"v_$t").toSet
      val now = System.currentTimeMillis()
      val committedCutoff = now - minAgeMs
      val inFlightCutoff = now - math.max(minAgeMs, graceMs)
      // commit time (marker mtime), or None for sealed-not-committed
      def commitTime(st: org.apache.hadoop.fs.FileStatus): Option[Long] =
        try Some(fs.getFileStatus(
          new Path(st.getPath, CommitMarker)).getModificationTime)
        catch { case _: java.io.FileNotFoundException => None }
      val versions = statuses.filter(_.getPath.getName.startsWith("v_"))
        .map(st => (st, commitTime(st)))
      val retainedRecent = versions
        .collect { case (st, Some(t)) => (st.getPath.getName, t) }
        .sortBy(-_._2).take(keepLast).map(_._1).toSet
      val committedAt = versions.collect {
        case (st, Some(t)) => st.getPath.getName -> t }.toMap
      statuses
        .filter { st =>
          val n = st.getPath.getName
          val isVersion = n.startsWith("v_")
          val isScratch = n.startsWith(".staging_") || n.startsWith("._current_")
          // same-JVM in-flight publishes: their staging dir is still
          // being written, and their SEALED v_ dir may not have reached
          // the pointer yet (the swap is waiting on this very lock) —
          // both must survive
          val active = inFlight.contains(n.stripPrefix("v_")
            .stripPrefix(".staging_").stripPrefix("._current_"))
          val aged = committedAt.get(n) match {
            case Some(t) => t < committedCutoff            // committed: user policy
            case None => st.getModificationTime < inFlightCutoff // maybe in flight
          }
          !active && aged &&
            ((isVersion && !live(n) && !retainedRecent(n)) || isScratch)
        }
        .map { st => fs.delete(st.getPath, true); st.getPath.toString }
    }
  }
}
