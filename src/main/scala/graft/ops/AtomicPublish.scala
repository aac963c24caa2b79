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

  /** Manifest: txn id, then one line per table — either a bare name
    * (the table's data lives in THIS version's dir) or `name=t1,t2,…`
    * (the table is the UNION of those versions' dirs — the append/carry
    * representation, so re-publishing unchanged history never copies
    * it). The same content is written as `_CURRENT` at commit and as
    * `_MANIFEST` inside the version dir (time-travel readers and
    * vacuum's reference chase resolve the latter). */
  private val ManifestFile = "_MANIFEST"

  private def renderManifest(txn: String,
      refs: Map[String, Seq[String]]): String =
    (txn +: refs.toSeq.sortBy(_._1).map { case (name, owners) =>
      if (owners == Seq(txn)) name else s"$name=${owners.mkString(",")}"
    }).mkString("\n")

  private def parseManifest(txn: String,
      lines: Seq[String]): Map[String, Seq[String]] =
    lines.filter(_.nonEmpty).map { line =>
      line.split("=", 2) match {
        case Array(name) => name -> Seq(txn)
        case Array(name, owners) => name -> owners.split(",").toSeq
      }
    }.toMap

  /** Table→owning-versions map of `txn`. Falls back to listing the dir
    * (self-owned tables) for versions sealed before `_MANIFEST` existed. */
  def manifestOf(spark: SparkSession, root: String,
      txn: String): Map[String, Seq[String]] = {
    val vdir = new Path(root, s"v_$txn")
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new Path(vdir, ManifestFile)
    if (fs.exists(mf)) {
      val in = fs.open(mf)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      parseManifest(txn, lines.drop(1))
    } else
      fs.listStatus(vdir).filter(_.isDirectory)
        .map(_.getPath.getName -> Seq(txn)).toMap
  }

  private def fc(spark: SparkSession, p: Path): FileContext =
    FileContext.getFileContext(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getUri,
      spark.sparkContext.hadoopConfiguration)

  /** Swap the `_CURRENT` pointer atomically; when `expectParent` is
    * given, the swap happens ONLY if the live txn still equals it at
    * swap time — checked under the same per-root lock that serializes
    * every same-JVM committer, making check-and-swap one atomic step in
    * this JVM (cross-process CAS would need an FS with conditional
    * rename; the residual window is documented on [[publishDelta]]).
    *
    * On HDFS the FileContext overwrite-rename is atomic server-side.
    * Hadoop's LOCAL fs implements it as delete+rename — a window where
    * readers see NO manifest and committers collide — so on the file
    * scheme the tmp manifest is written via NIO (outside the checksum
    * layer: a Hadoop-written tmp leaves an immortal .crc sidecar
    * behind, and a NIO move under a stale ._CURRENT.crc makes every
    * subsequent Hadoop read throw ChecksumException) and swapped with
    * POSIX rename(2) (ATOMIC_MOVE), which replaces in place. */
  private def swapPointer(spark: SparkSession, root: String, txn: String,
      manifest: Array[Byte],
      expectParent: Option[Option[String]]): Boolean = {
    val rootPath = new Path(root)
    val ctx = fc(spark, rootPath)
    val cur = new Path(rootPath, CurrentFile)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(cur).toUri
    def parentOk: Boolean =
      expectParent.forall(_ == currentTxn(spark, root))
    if (qualified.getScheme == "file") {
      val curNio = java.nio.file.Paths.get(qualified.getPath)
      val tmpNio = curNio.resolveSibling(s"._current_$txn")
      java.nio.file.Files.write(tmpNio, manifest)
      commitLock(spark, root).synchronized {
        if (!parentOk) {
          java.nio.file.Files.deleteIfExists(tmpNio); false
        } else {
          // a pre-NIO publish may have left a checksum sidecar for the
          // old manifest; it would fail verification against the new one
          java.nio.file.Files.deleteIfExists(
            curNio.resolveSibling(s".$CurrentFile.crc"))
          java.nio.file.Files.move(tmpNio, curNio,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          true
        }
      }
    } else {
      val tmp = new Path(rootPath, s"._current_$txn")
      val out = ctx.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
          org.apache.hadoop.fs.CreateFlag.OVERWRITE),
        Options.CreateOpts.createParent())
      try out.write(manifest) finally out.close()
      commitLock(spark, root).synchronized {
        if (!parentOk) {
          try ctx.delete(tmp, false) catch { case _: Throwable => () }
          false
        } else {
          ctx.rename(tmp, cur, Options.Rename.OVERWRITE); true
        }
      }
    }
  }

  /** Mark a sealed version as committed — see the vacuum contract.
    * Best-effort: if this write fails the publish has still succeeded
    * (the pointer moved); the version is then treated as uncommitted by
    * vacuum and reclaimed after the grace window once superseded —
    * availability of the LIVE version is never affected (vacuum spares
    * whatever the pointer names). */
  private def markCommitted(spark: SparkSession, root: String,
      txn: String): Unit =
    try {
      val vdir = new Path(root, s"v_$txn")
      val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mos = fs.create(new Path(vdir, CommitMarker), true)
      try mos.write(txn.getBytes(StandardCharsets.UTF_8)) finally mos.close()
    } catch { case _: Throwable => () }

  /** Stage table writes + the version's `_MANIFEST` under scratch, then
    * seal with one atomic dir rename (complete-or-absent). */
  private def stageAndSeal(spark: SparkSession, rootPath: Path, txn: String,
      tables: Map[String, DataFrame],
      refs: Map[String, Seq[String]]): Unit = {
    val scratch = new Path(rootPath, s".staging_$txn")
    val versioned = new Path(rootPath, s"v_$txn")
    val ctx = fc(spark, rootPath)
    ctx.mkdir(rootPath, null, true)
    tables.foreach { case (name, df) =>
      df.write.mode("error").parquet(new Path(scratch, name).toString)
    }
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mos = fs.create(new Path(scratch, ManifestFile), true)
    try mos.write(renderManifest(txn, refs).getBytes(StandardCharsets.UTF_8))
    finally mos.close()
    ctx.rename(scratch, versioned)
  }

  /** Write `tables` as one atomic publish; returns the txn id. Any write
    * failure propagates AFTER best-effort scratch cleanup, with the
    * previously published version fully intact. */
  /** Table names must survive the manifest grammar (no '=' or ','
    * separators, no newlines, no path separators). */
  private def validateNames(names: Iterable[String]): Unit =
    names.foreach { n =>
      require(n.nonEmpty && !n.exists(c =>
        c == '=' || c == ',' || c == '\n' || c == '\r' || c == '/'),
        s"table name '$n' is not manifest-safe " +
          "(must be non-empty, without '=', ',', newlines or '/')")
    }

  def publish(spark: SparkSession, root: String,
      tables: Map[String, DataFrame]): String = {
    require(tables.nonEmpty, "publish needs at least one table")
    validateNames(tables.keys)
    val txn = java.util.UUID.randomUUID().toString.replace("-", "")
    val rootPath = new Path(root)
    inFlight.add(txn)
    try {
      val refs = tables.keys.map(_ -> Seq(txn)).toMap
      stageAndSeal(spark, rootPath, txn, tables, refs)
      swapPointer(spark, root, txn,
        renderManifest(txn, refs).getBytes(StandardCharsets.UTF_8),
        expectParent = None)
      markCommitted(spark, root, txn)
      txn
    } catch {
      case e: Throwable =>
        val ctx = fc(spark, rootPath)
        try ctx.delete(new Path(rootPath, s".staging_$txn"), true)
        catch { case _: Throwable => () }
        try ctx.delete(new Path(rootPath, s"._current_$txn"), false)
        catch { case _: Throwable => () }
        throw e
    } finally inFlight.remove(txn)
  }

  /** Optimistic-concurrency DELTA publish: stage only what changed and
    * commit a version that REFERENCES the parent's data for everything
    * else — the steady-state shape for high-frequency appenders (a
    * micro-batch ingest writes its slice, never the corpus).
    *
    *  - `append`: each table's staged rows are ADDED to the parent's —
    *    the new version's manifest lists the parent's owning versions
    *    plus this txn; history is referenced, never copied.
    *  - `replace`: the staged rows REPLACE the table (compaction's
    *    move: rewrite the union small-file history into one owner).
    *  - every other parent table is carried by reference, untouched.
    *
    * The commit succeeds ONLY if the live txn still equals `parent` at
    * swap time (same-JVM exact via the per-root commit lock;
    * cross-process committers retain the FS-rename race window — run
    * one writer per store across processes, or arbitrate above).
    * Returns None on conflict — the caller re-reads the new current and
    * retries; the sealed version is left for vacuum (grace-windowed)
    * rather than deleted, since a crashed delete would strand it anyway. */
  def publishDelta(spark: SparkSession, root: String,
      append: Map[String, DataFrame],
      replace: Map[String, DataFrame] = Map.empty,
      parent: Option[String] = None): Option[String] = {
    require(append.nonEmpty || replace.nonEmpty,
      "publishDelta needs at least one appended or replaced table")
    require(append.keySet.intersect(replace.keySet).isEmpty,
      "a table cannot be both appended and replaced")
    validateNames(append.keys ++ replace.keys)
    val txn = java.util.UUID.randomUUID().toString.replace("-", "")
    val rootPath = new Path(root)
    inFlight.add(txn)
    try {
      val parentRefs =
        parent.map(manifestOf(spark, root, _)).getOrElse(Map.empty)
      val refs = parentRefs ++
        append.keys.map(n => n -> (parentRefs.getOrElse(n, Nil) :+ txn)) ++
        replace.keys.map(n => n -> Seq(txn))
      stageAndSeal(spark, rootPath, txn, append ++ replace, refs)
      val committed = swapPointer(spark, root, txn,
        renderManifest(txn, refs).getBytes(StandardCharsets.UTF_8),
        expectParent = Some(parent))
      if (committed) { markCommitted(spark, root, txn); Some(txn) }
      else None
    } catch {
      case e: Throwable =>
        val ctx = fc(spark, rootPath)
        try ctx.delete(new Path(rootPath, s".staging_$txn"), true)
        catch { case _: Throwable => () }
        try ctx.delete(new Path(rootPath, s"._current_$txn"), false)
        catch { case _: Throwable => () }
        throw e
    } finally inFlight.remove(txn)
  }

  /** The live (txn, table→owning versions) in ONE `_CURRENT` read, or
    * None before the first successful publish — `_CURRENT` carries the
    * full manifest, so resolving the live version never needs the
    * second `_MANIFEST` round-trip (it exists for time travel and
    * vacuum, which start from a txn id). */
  def currentManifest(spark: SparkSession,
      root: String): Option[(String, Map[String, Seq[String]])] = {
    val cur = new Path(root, CurrentFile)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cur)) None
    else {
      val in = fs.open(cur)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      val txn = lines.head.trim
      Some(txn -> parseManifest(txn, lines.drop(1)))
    }
  }

  /** The live txn id, or None before the first successful publish. */
  def currentTxn(spark: SparkSession, root: String): Option[String] =
    currentManifest(spark, root).map(_._1)

  /** Read a table from the CURRENT version — the only resolution path
    * readers use, so partially-published data is unreachable. A reader
    * needing cross-TABLE consistency under concurrent publishers should
    * pin the txn once ([[currentTxn]]) and read every table with
    * [[readTableAt]]: two `readTable` calls can legitimately span a
    * pointer swap. */
  def readTable(spark: SparkSession, root: String, table: String): DataFrame = {
    val (txn, refs) = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val owners = refs.getOrElse(table,
      throw new IllegalArgumentException(
        s"table '$table' is not in version $txn under $root"))
    spark.read.parquet(owners.map(t =>
      new Path(new Path(root, s"v_$t"), table).toString): _*)
  }

  /** Time travel: read a table at an explicit txn. Any version not yet
    * vacuumed is immutable and fully readable — the same guarantee a
    * table-format snapshot id gives, from the layout alone. Resolves
    * the version's manifest: an appended/carried table is the UNION of
    * its owning versions' dirs (one multi-path parquet read). */
  def readTableAt(spark: SparkSession, root: String, table: String,
      txn: String): DataFrame = {
    val owners = manifestOf(spark, root, txn).getOrElse(table,
      throw new IllegalArgumentException(
        s"table '$table' is not in version $txn under $root"))
    val paths = owners.map(t =>
      new Path(new Path(root, s"v_$t"), table).toString)
    spark.read.parquet(paths: _*)
  }

  /** One-shot migration for stores published before `_COMMITTED`
    * markers existed: stamp EVERY existing version dir as committed so
    * `keepLast`/`minAgeMs` retention ranks them again. Markers are
    * back-dated to each dir's mtime, so ranking approximates the
    * original publish order instead of the migration instant. Run it
    * only while no publisher is mid-flight against this root — it
    * cannot distinguish a pre-marker published version from another
    * process's sealed-but-uncommitted one (both are marker-less by
    * definition). Intended strictly for pre-marker stores, which also
    * predate `publishDelta` and therefore contain no CAS-loser dirs; on
    * a post-delta store this would stamp losers as committed and let
    * them claim retention slots. */
  def adoptCommitted(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Nil
    commitLock(spark, root).synchronized {
      fs.listStatus(rootPath).toSeq
        .filter(st => st.getPath.getName.startsWith("v_") &&
          !fs.exists(new Path(st.getPath, CommitMarker)))
        .map { st =>
          val txn = st.getPath.getName.stripPrefix("v_")
          markCommitted(spark, root, txn)
          try fs.setTimes(new Path(st.getPath, CommitMarker),
            st.getModificationTime, -1)
          catch { case _: Throwable => () }
          txn
        }
    }
  }

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
    * Retention additionally protects the reference CLOSURE of EVERY
    * surviving version — live, keepLast-retained, age/grace-spared, or
    * itself referenced: a version whose manifest points at older
    * versions' dirs (publishDelta append/carry) keeps them all alive,
    * so nothing a surviving version unions over can be reclaimed. A
    * manifest that cannot be read aborts the vacuum (anything else
    * would risk deleting dirs the unreadable manifest references).
    *
    * Returns the deleted paths. The pointer is additionally re-read
    * after listing, and any version named by either read survives. A
    * version whose marker write failed (crash in the post-swap window)
    * degrades to the marker-less case: protected while live or young,
    * reclaimable once aged — never able to brick the live store. The
    * live version self-heals its marker here, so stores created before
    * markers existed regain exact retention going forward; for bulk
    * migration of OLD versions run [[adoptCommitted]] once. */
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
      // heal pre-marker stores: the LIVE version provably committed (the
      // pointer names it) — give it its marker so retention can rank it
      liveAfter.foreach { t =>
        if (!committedAt.contains(s"v_$t") &&
            fs.exists(new Path(rootPath, s"v_$t")))
          markCommitted(spark, root, t)
      }
      def isActive(n: String): Boolean =
        inFlight.contains(n.stripPrefix("v_")
          .stripPrefix(".staging_").stripPrefix("._current_"))
      def isAged(st: org.apache.hadoop.fs.FileStatus): Boolean =
        committedAt.get(st.getPath.getName) match {
          case Some(t) => t < committedCutoff            // committed: user policy
          case None => st.getModificationTime < inFlightCutoff // maybe in flight
        }
      // EVERY version that survives this vacuum — live, keepLast-
      // retained, age/grace-spared, or in-flight — keeps the dirs its
      // manifest references (deleting one would hollow out its unions).
      // Seeded from all survivors, expanded to a fixpoint (cheap: refs
      // are direct data-dir pointers, flattened at publish time). An
      // unreadable manifest ABORTS the vacuum: degrading to "no refs"
      // could delete dirs the unreadable manifest still points at.
      val survivorsByPolicy = versions.collect {
        case (st, _) if live(st.getPath.getName) ||
          retainedRecent(st.getPath.getName) ||
          isActive(st.getPath.getName) || !isAged(st) => st.getPath.getName
      }.toSet
      def refsOf(vs: Set[String]): Set[String] = vs.flatMap { v =>
        try manifestOf(spark, root, v.stripPrefix("v_"))
          .values.flatten.map(t => s"v_$t")
        catch {
          case _: java.io.FileNotFoundException => Set.empty[String]
          case e: Throwable => throw new java.io.IOException(
            s"vacuum aborted: cannot read manifest of $v under $root — " +
              "retrying later is safe; proceeding could delete referenced data", e)
        }
      }
      var protectedVersions = survivorsByPolicy
      var frontier = refsOf(protectedVersions) -- protectedVersions
      while (frontier.nonEmpty) {
        protectedVersions ++= frontier
        frontier = refsOf(frontier) -- protectedVersions
      }
      statuses
        .filter { st =>
          val n = st.getPath.getName
          val isVersion = n.startsWith("v_")
          val isScratch = n.startsWith(".staging_") || n.startsWith("._current_")
          // same-JVM in-flight publishes: their staging dir is still
          // being written, and their SEALED v_ dir may not have reached
          // the pointer yet (the swap is waiting on this very lock) —
          // both must survive
          !isActive(n) && isAged(st) &&
            ((isVersion && !protectedVersions(n)) || isScratch)
        }
        .map { st => fs.delete(st.getPath, true); st.getPath.toString }
    }
  }
}
