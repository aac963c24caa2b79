package graft.ops

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.AtomicPublish.TableMeta

/** The store as a REAL SQL catalog: `spark.sql.catalog.<name> =
  * graft.ops.GraftCatalog` (+ `.root = <store root>`) mounts every
  * published table as `<name>.<table>` — no `registerViews` call, no
  * temp-view lifetime, plain `SELECT`/`INSERT` against names that
  * resolve through Spark's own catalog manager. The catalog can be
  * registered at runtime (`spark.conf.set`); Spark instantiates it on
  * first reference.
  *
  * Reads resolve the live version AT ANALYSIS TIME — a PER-TABLE pin:
  * each `loadTable` resolution pins the then-current txn, so one
  * statement touching one table reads one immutable snapshot, but a
  * query joining two catalog tables can observe different versions if
  * a commit lands between the two resolutions. For cross-table
  * consistency under concurrent writers, pin the SESSION: `SET
  * graft.snapshot.<catalog> = auto` (pin-at-first-resolution) or
  * `= '<txn>'` (explicit version) makes every resolution serve ONE
  * snapshot until the conf is unset (see [[GraftCatalog.pinnedTxn]];
  * `registerViews`/`readTableAt` remain the programmatic routes).
  * Reads plan through [[V1Scan]] into
  * the SAME
  * delete-aware [[AtomicPublish.readTableAt]] DataFrame every other
  * read face uses: the inner plan mounts [[GraftFileIndex]], so
  * partition pruning, segment zone maps, per-file zone maps, bloom
  * sidecars AND the tombstone anti-join all serve catalog SQL. This is
  * the V1-relation compatibility route Spark's own JDBC v2 connector
  * ships on — deliberately NOT a custom `PartitionReaderFactory`, for
  * the reasons [[GraftFileIndex]]'s scaladoc records (keep the
  * vectorized parquet reader, row-group pushdown, codegen).
  *
  * SQL time travel: `VERSION AS OF '<txn>'` pins an explicit published
  * version; `TIMESTAMP AS OF <ts>` resolves the latest commit
  * at-or-before the timestamp via [[AtomicPublish.committedVersions]]
  * (the Delta/Iceberg contract).
  *
  * Writes: `INSERT INTO <name>.<table>` appends one atomic
  * CAS-committed segment through the same publish path as
  * `df.write.format("graft")`; `INSERT OVERWRITE` replaces the table
  * while re-declaring its recorded layout (partitioning, stat/bloom
  * columns survive the overwrite — the manifest owns the layout, not
  * the writer). `ALTER TABLE ADD COLUMNS` commits widening evolution
  * without data (see [[alterTable]]).
  *
  * DDL birth and death: `CREATE TABLE` (and CTAS — Spark creates, then
  * appends through the ordinary write builder) commits an EMPTY table
  * manifest entry carrying the declared schema and layout, so a
  * SQL-only session stands up a store from nothing — the way the
  * reference bootstraps its schema declaratively
  * (/root/reference/app/main.py:30-32, `Base.metadata.create_all`).
  * Layout is declared via `PARTITIONED BY` (identity transforms) and
  * TBLPROPERTIES `statsBy`/`bloomBy`/`clusterBy` (comma-joined column
  * lists) + `zOrder` ("true" with clusterBy for z-order locality).
  * `DROP TABLE` is a metadata-only O(1) commit removing the table (and
  * its tombstone companion) from the manifest: versions before the
  * drop still time-travel to it, and vacuum reclaims the data once
  * they age out. A dropped name can be re-created with a fresh schema.
  * `ALTER TABLE … RENAME TO` is metadata-only too (the per-owner dir
  * mapping); `RENAME COLUMN`/`DROP COLUMN` are copy-on-write rewrites
  * (see [[alterColumnCow]]).
  *
  * (Reference analog: /root/reference/app/models/patient.py declares
  * tables once and every query resolves them by name through the ORM's
  * metadata — this catalog is that name-resolution layer, grown onto
  * the store.)
  *
  * Maintenance and operations are SQL too: the catalog is a
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]] —
  * `CALL <cat>.system.compact/vacuum/history/consumers/restore/clone/
  * detail/add_check/drop_check/matview/drop_matview(...)` run the
  * store's maintenance, rollback, forking, constraint and
  * materialized-view operations and return their summary rows
  * ([[GraftProcedures]]) — a SQL-only session operates the store end
  * to end.
  */
object GraftCatalog {
  /** `graft.snapshot=auto` pins: WEAK-keyed by the owning
    * SparkSession (real reference identity — ADVICE-r8 low:
    * `System.identityHashCode` could collide or be reused after a GC
    * and serve one session's pin to another, and dead-session entries
    * accumulated forever; weak keys make the GC the eviction policy),
    * then by (catalog, root) within the session. A pin is dropped
    * whenever the conf is unset or made explicit, so it never outlives
    * the directive that created it. */
  private[ops] val autoPins: java.util.Map[
      org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), String]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap())

  private[ops] def pinsOf(spark: org.apache.spark.sql.SparkSession)
      : scala.collection.concurrent.TrieMap[(String, String), String] =
    autoPins.synchronized {
      var m = autoPins.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), String]
        autoPins.put(spark, m)
      }
      m
    }
}

final class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.root must point at a graft store root"))
  }

  override def name(): String = catName

  /** The store root this catalog mounts — the handle the injected SQL
    * faces (MATERIALIZED VIEW DDL) resolve a catalog name through. */
  private[ops] def storeRoot: String = root

  private def spark = SparkSession.active

  /** Tables live at the catalog root: `<name>.<table>`, with
    * `default` accepted as an alias namespace so `USE <name>` +
    * unqualified names resolve too. */
  private def okNs(ns: Array[String]): Boolean =
    ns.isEmpty || (ns.length == 1 && ns(0) == "default")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!okNs(namespace)) throw new NoSuchNamespaceException(namespace)
    AtomicPublish.currentManifestMeta(spark, root) match {
      case None => Array.empty
      case Some((_, metas)) => metas.keys.toSeq.sorted
        .map(Identifier.of(namespace, _)).toArray
    }
  }

  private def load(ident: Identifier, txn: String): Table = {
    val metas =
      try AtomicPublish.manifestMetaOf(spark, root, txn)
      catch { case scala.util.control.NonFatal(_) =>
        throw new NoSuchTableException(ident) }
    val meta = metas.getOrElse(ident.name(),
      throw new NoSuchTableException(ident))
    new GraftTable(root, ident.name(), txn, meta)
  }

  /** SESSION-PINNED SNAPSHOT (VERDICT-r7 ask #5): `SET
    * graft.snapshot.<catalog> = auto` (or the catalog-agnostic
    * `graft.snapshot`) pins the catalog's version at the FIRST
    * resolution after the SET, so a multi-table SQL join reads ONE
    * consistent snapshot even when commits land between its table
    * resolutions — `registerViews`-grade consistency without leaving
    * SQL. An explicit txn id instead of `auto` pins that exact
    * version. Unsetting the conf drops the pin (the next resolution
    * re-pins live; a later `auto` re-pins fresh). The pin governs
    * READS: writes always commit against the LIVE chain, and
    * MERGE/UPDATE under a stale pin fail with their named conflict
    * error rather than mixing snapshots. */
  private def pinnedTxn(): Option[String] = {
    val pins = GraftCatalog.pinsOf(spark)
    val key = (catName, root)
    def confOpt(k: String): Option[String] =
      try spark.conf.getOption(k)
      catch { case scala.util.control.NonFatal(_) => None }
    confOpt(s"graft.snapshot.$catName")
      .orElse(confOpt("graft.snapshot"))
      .map(_.trim).filter(_.nonEmpty) match {
      case None =>
        pins.remove(key); None
      case Some("auto") =>
        Some(pins.getOrElseUpdate(key,
          AtomicPublish.currentTxn(spark, root).getOrElse(
            throw new IllegalStateException(
              s"graft.snapshot=auto: no published version under $root"))))
      case Some(explicit) =>
        pins.remove(key); Some(explicit)
    }
  }

  override def loadTable(ident: Identifier): Table = {
    if (!okNs(ident.namespace())) throw new NoSuchTableException(ident)
    val txn = pinnedTxn()
      .orElse(AtomicPublish.currentTxn(spark, root)).getOrElse(
        throw new NoSuchTableException(ident))
    load(ident, txn)
  }

  /** SQL `VERSION AS OF '<txn>'`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!okNs(ident.namespace())) throw new NoSuchTableException(ident)
    load(ident, version)
  }

  /** SQL `TIMESTAMP AS OF <ts>` (microseconds since epoch, per the
    * connector contract): latest version committed at or before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!okNs(ident.namespace())) throw new NoSuchTableException(ident)
    val tsMs = timestamp / 1000L
    val at = AtomicPublish.committedVersions(spark, root)
      .takeWhile(_._2 <= tsMs).lastOption.getOrElse(
        throw new NoSuchTableException(ident))
    load(ident, at._1)
  }

  override def tableExists(ident: Identifier): Boolean =
    okNs(ident.namespace()) &&
      AtomicPublish.currentManifestMeta(spark, root)
        .exists(_._2.contains(ident.name()))

  private def unsupported(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog '$catName' does not support $op — tables are " +
        "born and reshaped by publishing data (AtomicPublish.publish / " +
        "df.write.format(\"graft\"))")

  /** `CREATE TABLE` / the create half of CTAS: one CAS commit of an
    * EMPTY slice carrying the declared schema + layout. Partitioning
    * accepts identity transforms only (the store's layout model);
    * TBLPROPERTIES declare the skipping/clustering layout (class doc).
    * The empty table is immediately insertable, droppable and
    * time-travelable like any published table. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (!okNs(ident.namespace())) throw new NoSuchNamespaceException(
      ident.namespace())
    val (bucketTs, identTs) = partitions.toSeq.partition(_.name == "bucket")
    val partCols = identTs.map { t =>
      def oneCol: String = {
        require(t.references.length == 1 &&
          t.references()(0).fieldNames.length == 1,
          s"partition transform '$t' must reference one top-level column")
        t.references()(0).fieldNames()(0)
      }
      t.name match {
        case "identity" => oneCol
        // `PARTITIONED BY (days(ts))` etc. — hidden calendar
        // partitioning ([[PartSpec]]): the layout derives from the raw
        // column at write time and predicates on it prune at read time
        case "days" | "months" | "years" | "hours" =>
          s"${t.name}($oneCol)"
        case _ => unsupported(
          s"partition transform '$t' (identity columns, " +
            "years/months/days/hours(col) and bucket(n, …) only)")
      }
    }
    // SQL-native bucketing: `CLUSTERED BY (c, …) INTO n BUCKETS`
    // arrives as one bucket transform
    val bucketFromDdl: Option[(Seq[String], Int)] = bucketTs match {
      case Nil => None
      case Seq(bt) =>
        val n = bt.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value.isInstanceOf[Int] => l.value.asInstanceOf[Int]
        }.getOrElse(unsupported(s"bucket transform '$bt'"))
        Some((bt.references.toSeq.map { r =>
          require(r.fieldNames.length == 1,
            s"bucket column '${r.fieldNames.mkString(".")}' must be " +
              "top-level")
          r.fieldNames()(0)
        }, n))
      case _ => unsupported("multiple bucket transforms")
    }
    // TBLPROPERTIES keys arrive as written; accept any case
    val props = properties.asScala.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
    def propCols(key: String): Seq[String] = props.get(key)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)
    val statsCols = propCols("statsby")
    val bloomCols = propCols("bloomby")
    val clusterCols = propCols("clusterby")
    val zOrder = props.get("zorder").exists(_.equalsIgnoreCase("true"))
    require(clusterCols.nonEmpty || !zOrder,
      "zOrder=true needs a clusterBy column list")
    // TBLPROPERTIES fallback for the same declaration:
    // 'bucketBy' = '<numBuckets>:<col>[,<col>…]'
    val bucketFromProps: Option[(Seq[String], Int)] =
      props.get("bucketby").map { s =>
        s.split(":", 2) match {
          case Array(n, cs) if scala.util.Try(n.trim.toInt).isSuccess =>
            (cs.split(",").toSeq.map(_.trim).filter(_.nonEmpty),
              n.trim.toInt)
          case _ => throw new IllegalArgumentException(
            s"bucketBy must be '<numBuckets>:<col>[,<col>…]', got '$s'")
        }
      }
    require(bucketFromDdl.isEmpty || bucketFromProps.isEmpty ||
        bucketFromDdl == bucketFromProps,
      "CLUSTERED BY … INTO … BUCKETS and TBLPROPERTIES bucketBy disagree")
    val bucketSpec = bucketFromDdl.orElse(bucketFromProps)
    // CHECK constraints: TBLPROPERTIES 'check.<name>' = '<predicate>';
    // NOT NULL columns in the declared schema become derived checks
    // (`nn_<col>`), so the SQL-native nullability declaration is
    // ENFORCED on every write face, not just recorded
    val checkProps: Map[String, String] = props.collect {
      case (k, v) if k.startsWith("check.") => k.stripPrefix("check.") -> v
    }
    // derived check names must survive the manifest grammar even when
    // the COLUMN name carries manifest-unsafe characters (':', '@',
    // ',', '=', '/', '#' are all legal in a Spark column): sanitize
    // the embedded name and disambiguate sanitization collisions with
    // a short hash of the raw name (ADVICE-r7: an unsanitized nn_<col>
    // made CREATE TABLE with such a NOT NULL column fail outright)
    def safeCheckName(colName: String): String = {
      val cleaned = colName.map(c =>
        if ("=,\n\r/#:@".contains(c)) '_' else c)
      if (cleaned == colName) s"nn_$colName"
      else s"nn_${cleaned}_" + java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(colName))
    }
    val notNullChecks: Map[String, String] = schema.fields
      .filterNot(_.nullable)
      .map(f => safeCheckName(f.name) ->
        s"`${f.name.replace("`", "``")}` IS NOT NULL").toMap
    val allChecks = notNullChecks ++ checkProps
    (partCols.map(PartSpec.referencedCol) ++ statsCols ++
        bloomCols ++ clusterCols ++
        bucketSpec.map(_._1).getOrElse(Nil)).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"layout column '$c' is not in the declared schema of " +
          s"'${ident.name()}'"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val t = ident.name()
    def lay(of: Seq[String]): Map[String, Seq[String]] =
      if (of.isEmpty) Map.empty else Map(t -> of)
    val clusterLay: Map[String, (Seq[String], Boolean)] =
      if (clusterCols.isEmpty) Map.empty
      else Map(t -> (clusterCols, zOrder))
    val bucketLay: Map[String, (Seq[String], Int)] =
      bucketSpec.map(s => Map(t -> s)).getOrElse(Map.empty)
    val checkLay: Map[String, Map[String, String]] =
      if (allChecks.isEmpty) Map.empty else Map(t -> allChecks)
    var attempt = 0
    while (attempt < GraftSource.MaxCommitAttempts) {
      attempt += 1
      AtomicPublish.currentTxn(spark, root) match {
        case None =>
          AtomicPublish.publish(spark, root, Map(t -> empty),
            partitionBy = lay(partCols), statsBy = lay(statsCols),
            bloomBy = lay(bloomCols), clusterBy = clusterLay,
            bucketBy = bucketLay, checks = checkLay)
          return loadTable(ident)
        case Some(parent) =>
          if (AtomicPublish.manifestMetaOf(spark, root, parent)
              .contains(t))
            throw new org.apache.spark.sql.catalyst.analysis
              .TableAlreadyExistsException(ident)
          // replace-of-absent = create; carries the declared layout
          val committed = AtomicPublish.publishDelta(spark, root,
            append = Map.empty, replace = Map(t -> empty),
            parent = Some(parent), partitionBy = lay(partCols),
            statsBy = lay(statsCols), bloomBy = lay(bloomCols),
            clusterBy = clusterLay, bucketBy = bucketLay,
            checks = checkLay)
          if (committed.isDefined) return loadTable(ident)
        // CAS lost: re-pin and retry
      }
    }
    throw new IllegalStateException(
      s"CREATE TABLE '${ident.name()}' lost the commit race " +
        s"${GraftSource.MaxCommitAttempts} times")
  }

  /** `ALTER TABLE <name> ADD COLUMNS (...)` — widening evolution
    * WITHOUT data: commits an empty slice carrying the widened schema
    * through the ordinary append path, so the recorded schema gains the
    * (nullable) columns, every existing segment reads them as null, and
    * history stays time-travelable (the pre-ALTER version still serves
    * the old shape). This rides the same validated schema-merge appends
    * use — nothing new to trust. Only top-level nullable ADDs are
    * supported: a non-null add would invent values for existing rows,
    * and type changes are refused by the merge contract itself. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!okNs(ident.namespace())) throw new NoSuchTableException(ident)
    changes.toList match {
      case List(u: TableChange.UpdateColumnType) =>
        // `ALTER TABLE t ALTER COLUMN c TYPE BIGINT` — O(1) metadata
        // WIDENING: one empty-slice append whose schema carries the
        // wider type rides the ordinary merge ([[AtomicPublish
        // .mergeSchemas]] widens; float-era zone maps re-encode in the
        // same commit). Non-widening changes are refused by the merge
        // contract itself; no data is read or written.
        require(u.fieldNames.length == 1,
          s"ALTER COLUMN on '$catName' supports top-level columns " +
            s"only (got ${u.fieldNames.mkString(".")})")
        val colName = u.fieldNames()(0)
        var attempt = 0
        while (attempt < GraftSource.MaxCommitAttempts) {
          attempt += 1
          val parent = AtomicPublish.currentTxn(spark, root).getOrElse(
            throw new NoSuchTableException(ident))
          val meta = AtomicPublish.manifestMetaOf(spark, root, parent)
            .getOrElse(ident.name(), throw new NoSuchTableException(ident))
          val recorded = meta.schema.getOrElse(
            throw new IllegalStateException(
              s"table '${ident.name()}' predates recorded schemas"))
          require(recorded.fieldNames.contains(colName),
            s"column '$colName' is not in table '${ident.name()}'")
          val cur = recorded(colName).dataType
          // must be a STRICT widening — a narrower/equal target would
          // silently no-op under the merge (which keeps the wider side)
          require(cur.catalogString != u.newDataType.catalogString &&
            AtomicPublish.widerOf(cur, u.newDataType)
              .exists(_.catalogString == u.newDataType.catalogString),
            s"ALTER COLUMN '$colName': ${cur.simpleString} → " +
              s"${u.newDataType.simpleString} is not a lossless " +
              "widening (byte→short→int→long, float→double)")
          val widened = StructType(recorded.fields.map(f =>
            if (f.name == colName) f.copy(dataType = u.newDataType) else f))
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], widened)
          // the merge validates the pair is a lossless widening; an
          // empty append carries no data so a lost race rebases freely
          if (AtomicPublish.publishDelta(spark, root,
              append = Map(ident.name() -> empty),
              parent = Some(parent), rebase = true).isDefined)
            return loadTable(ident)
          // CAS lost: re-pin and retry
        }
        throw new IllegalStateException(
          s"ALTER COLUMN '${ident.name()}.$colName' lost the commit " +
            s"race ${GraftSource.MaxCommitAttempts} times")
      case List(sp: TableChange.SetProperty)
          if sp.property == "partition-spec" =>
        // `ALTER TABLE t SET TBLPROPERTIES('partition-spec' =
        // 'months(ts)')` — the SQL face of [[AtomicPublish
        // .setPartitionSpec]]: O(1) spec evolution, calendar
        // transforms only, no data movement. The property name
        // mirrors what DESCRIBE EXTENDED / SHOW TBLPROPERTIES report.
        val spec = sp.value.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        var attempt = 0
        while (attempt < GraftSource.MaxCommitAttempts) {
          attempt += 1
          val parent = AtomicPublish.currentTxn(spark, root).getOrElse(
            throw new NoSuchTableException(ident))
          if (AtomicPublish.setPartitionSpec(spark, root, ident.name(),
              spec, Some(parent)).isDefined)
            return loadTable(ident)
        }
        throw new IllegalStateException(
          s"ALTER TABLE '${ident.name()}' SET partition-spec lost the " +
            s"commit race ${GraftSource.MaxCommitAttempts} times")
      case List(r: TableChange.RenameColumn) =>
        require(r.fieldNames.length == 1,
          s"ALTER TABLE RENAME COLUMN on '$catName' supports top-level " +
            s"columns only (got ${r.fieldNames.mkString(".")})")
        return alterColumnCow(ident, r.fieldNames()(0),
          rename = Some(r.newName))
      case List(d: TableChange.DeleteColumn) =>
        require(d.fieldNames.length == 1,
          s"ALTER TABLE DROP COLUMN on '$catName' supports top-level " +
            s"columns only (got ${d.fieldNames.mkString(".")})")
        return alterColumnCow(ident, d.fieldNames()(0), rename = None)
      case _ => () // the ADD COLUMNS path below
    }
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.isNullable,
          s"ALTER TABLE ADD COLUMNS on '$catName' requires nullable " +
            s"columns — existing rows have no value for " +
            a.fieldNames().mkString("."))
        a
      case other => unsupported(s"ALTER TABLE change $other")
    }

    /** Insert `dt` at `path` (a dotted field path whose LAST component
      * is the new field's name, every prefix an existing struct):
      * nested schema evolution's DDL face — `ADD COLUMNS (s.f type)`.
      * Old segments serve null at the nested path (the parquet readers
      * clip the requested schema per file footer). */
    def addAt(schema: org.apache.spark.sql.types.StructType,
        path: Seq[String], dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.StructType = {
      val name = path.head
      if (path.length == 1) {
        require(!schema.fieldNames.contains(name),
          s"ALTER TABLE ADD COLUMNS: '$name' already exists " +
            s"on '${ident.name()}'")
        org.apache.spark.sql.types.StructType(schema.fields :+
          org.apache.spark.sql.types.StructField(name, dt,
            nullable = true))
      } else {
        val idx =
          try schema.fieldIndex(name)
          catch { case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"ALTER TABLE ADD COLUMNS: no field '$name' " +
                s"on '${ident.name()}'")
          }
        schema.fields(idx).dataType match {
          case st: org.apache.spark.sql.types.StructType =>
            org.apache.spark.sql.types.StructType(schema.fields
              .updated(idx, schema.fields(idx)
                .copy(dataType = addAt(st, path.tail, dt))))
          case other => throw new IllegalArgumentException(
            s"ALTER TABLE ADD COLUMNS: '$name' on '${ident.name()}' " +
              s"is ${other.simpleString}, not a struct — nested adds " +
              "need a struct at every path prefix")
        }
      }
    }
    var attempt = 0
    while (attempt < GraftSource.MaxCommitAttempts) {
      attempt += 1
      val parent = AtomicPublish.currentTxn(spark, root).getOrElse(
        throw new NoSuchTableException(ident))
      val meta = AtomicPublish.manifestMetaOf(spark, root, parent)
        .getOrElse(ident.name(), throw new NoSuchTableException(ident))
      val recorded = meta.schema.getOrElse(throw new IllegalStateException(
        s"table '${ident.name()}' predates recorded schemas"))
      val widened = adds.foldLeft(recorded)((s, a) =>
        addAt(s, a.fieldNames().toSeq, a.dataType))
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], widened)
      val committed = AtomicPublish.publishDelta(spark, root,
        append = Map(ident.name() -> empty), parent = Some(parent),
        rebase = true)
      if (committed.isDefined) return loadTable(ident)
      // CAS lost: re-pin and retry
    }
    throw new IllegalStateException(
      s"ALTER TABLE '${ident.name()}' lost the commit race " +
        s"${GraftSource.MaxCommitAttempts} times")
  }

  /** `ALTER TABLE … RENAME COLUMN old TO new` / `DROP COLUMN c`:
    * COPY-ON-WRITE — one replace commit of the projected table under
    * the evolved schema, with the declared layout (partition / stat /
    * bloom / cluster / bucket columns) renamed along. Deliberately NOT
    * Delta-style metadata-only column mapping: that buys O(1) alters
    * at the price of a field-id indirection inside every parquet read
    * forever; here the rewrite is paid once and history still
    * time-travels to the old shape. Refused when the column is the
    * table's pinned delete key (the tombstone companion's schema names
    * it) or is referenced by a CHECK constraint (predicate SQL cannot
    * be rewritten safely) — drop the constraint first. */
  private def alterColumnCow(ident: Identifier, colName: String,
      rename: Option[String]): Table = {
    val t = ident.name()
    var attempt = 0
    while (attempt < GraftSource.MaxCommitAttempts) {
      attempt += 1
      val parent = AtomicPublish.currentTxn(spark, root).getOrElse(
        throw new NoSuchTableException(ident))
      val metas = AtomicPublish.manifestMetaOf(spark, root, parent)
      val meta = metas.getOrElse(t, throw new NoSuchTableException(ident))
      val recorded = meta.schema.getOrElse(throw new IllegalStateException(
        s"table '$t' predates recorded schemas"))
      require(recorded.fieldNames.contains(colName),
        s"column '$colName' is not in table '$t'")
      rename.foreach(n => require(!recorded.fieldNames.contains(n),
        s"column '$n' already exists on '$t'"))
      require(rename.isDefined || recorded.fields.length > 1,
        s"cannot drop the only column of '$t'")
      // the pinned delete key lives in the companion's schema — a
      // rename/drop would silently unhook every future delete
      val deleteKey = metas.get(AtomicPublish.deleteTableOf(t))
        .flatMap(_.schema)
        .map(_.fieldNames.toSeq.filterNot(_ == "_asof")).getOrElse(Nil)
      require(!deleteKey.contains(colName),
        s"column '$colName' is the pinned delete key of '$t' — " +
          "row-level delete history depends on it")
      // a CHECK predicate's SQL cannot be rewritten safely
      meta.checks.foreach { case (cn, pred) =>
        val refs =
          try spark.sessionState.sqlParser.parseExpression(pred).collect {
            case a: org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute => a.name
          } catch { case scala.util.control.NonFatal(_) =>
            Seq(colName) // unparseable → conservatively referencing
          }
        require(!refs.exists(_.equalsIgnoreCase(colName)),
          s"column '$colName' is referenced by check constraint '$cn' " +
            s"($pred) — CALL drop_check first")
      }
      def mapped(cols: Seq[String]): Seq[String] = rename match {
        case Some(n) => cols.map(c => if (c == colName) n else c)
        case None => cols // guarded below: layout cols refuse DROP
      }
      // partition specs may be calendar transforms — rename maps the
      // SOURCE column inside the spec; drop refuses on the source
      def mappedParts(specs: Seq[String]): Seq[String] = rename match {
        case Some(n) => specs.map(PartSpec.renameIn(_, colName, n))
        case None => specs
      }
      if (rename.isEmpty) {
        val layout = (meta.partitionCols.map(PartSpec.referencedCol) ++
          meta.statCols ++
          meta.bloomCols ++ meta.clusterCols ++ meta.bucketCols).distinct
        require(!layout.contains(colName),
          s"column '$colName' is part of '$t''s declared layout " +
            s"(${layout.mkString(", ")}) — redeclare the layout first")
      }
      val base = AtomicPublish.readTableAt(spark, root, t, parent)
      val projected = rename match {
        case Some(n) => base.withColumnRenamed(colName, n)
        case None => base.drop(colName)
      }
      def lay(of: Seq[String]): Map[String, Seq[String]] =
        if (of.isEmpty) Map.empty else Map(t -> mapped(of))
      val committed = AtomicPublish.publishDelta(spark, root,
        append = Map.empty, replace = Map(t -> projected),
        parent = Some(parent),
        partitionBy = if (meta.partitionCols.isEmpty) Map.empty
          else Map(t -> mappedParts(meta.partitionCols)),
        statsBy = lay(meta.statCols), bloomBy = lay(meta.bloomCols),
        clusterBy = if (meta.clusterCols.isEmpty) Map.empty
          else Map(t -> (mapped(meta.clusterCols), meta.clusterZOrder)),
        bucketBy = if (meta.numBuckets == 0) Map.empty
          else Map(t -> (mapped(meta.bucketCols), meta.numBuckets)))
      if (committed.isDefined) return loadTable(ident)
      // CAS lost: re-pin and retry
    }
    throw new IllegalStateException(
      s"ALTER TABLE '$t' lost the commit race " +
        s"${GraftSource.MaxCommitAttempts} times")
  }

  /** `DROP TABLE`: metadata-only removal in one CAS commit ([[
    * AtomicPublish.publishDelta]] `drop`) — O(1), no data touched;
    * pre-drop versions still time-travel, vacuum reclaims later. */
  override def dropTable(ident: Identifier): Boolean = {
    if (!okNs(ident.namespace())) return false
    var attempt = 0
    while (attempt < GraftSource.MaxCommitAttempts) {
      attempt += 1
      AtomicPublish.currentTxn(spark, root) match {
        case None => return false
        case Some(parent) =>
          if (!AtomicPublish.manifestMetaOf(spark, root, parent)
              .contains(ident.name())) return false
          val committed = AtomicPublish.publishDelta(spark, root,
            append = Map.empty, drop = Seq(ident.name()),
            parent = Some(parent))
          if (committed.isDefined) return true
        // CAS lost: re-pin and retry
      }
    }
    throw new IllegalStateException(
      s"DROP TABLE '${ident.name()}' lost the commit race " +
        s"${GraftSource.MaxCommitAttempts} times")
  }

  /** `ALTER TABLE <name> RENAME TO <new>`: one O(1) metadata commit
    * through the per-owner dir mapping ([[AtomicPublish.renameTable]])
    * — no data moves, pre-rename versions still time-travel to the
    * old name. */
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!okNs(oldIdent.namespace())) throw new NoSuchTableException(oldIdent)
    if (!okNs(newIdent.namespace())) throw new NoSuchNamespaceException(
      newIdent.namespace())
    var attempt = 0
    while (attempt < GraftSource.MaxCommitAttempts) {
      attempt += 1
      if (AtomicPublish.renameTable(spark, root, oldIdent.name(),
          newIdent.name()).isDefined) return
      // CAS lost: re-pin and retry
    }
    throw new IllegalStateException(
      s"RENAME TABLE '${oldIdent.name()}' lost the commit race " +
        s"${GraftSource.MaxCommitAttempts} times")
  }

  /** Procedures live under the `system` namespace (the Iceberg
    * convention): `CALL <cat>.system.<proc>(...)`. */
  private def sysNs(ns: Array[String]): Boolean =
    ns.length == 1 && ns(0).equalsIgnoreCase("system")

  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || sysNs(namespace))
      GraftProcedures.names
        .map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val known =
      if (sysNs(ident.namespace()))
        GraftProcedures.load(root, ident.name()) else None
    known.getOrElse(throw new UnsupportedOperationException(
      s"procedure ${ident.namespace().mkString(".")}.${ident.name()} " +
        s"is not defined on graft catalog '$catName' — available: " +
        GraftProcedures.names.map("system." + _).mkString(", ")))
  }
}

/** One store table pinned at one published version — the V2 face over
  * the store's V1 read/write machinery.
  *
  * `DELETE FROM <cat>.<table> WHERE <pred>` maps onto merge-on-read
  * tombstones ([[AtomicPublish.deleteRows]]): the matching rows' key
  * tuples become the tombstone key set in ONE O(keys) CAS commit — no
  * data rewrite, history stays time-travelable, and a later re-append
  * of a deleted key lives (the `_asof` scope). The store fixes ONE
  * tombstone key per table — a single column or a COMPOSITE tuple —
  * so the first DELETE establishes it (the
  * predicate's referenced columns — exact by construction: the
  * predicate is a function of those columns alone, so rows sharing a
  * matching tuple all match); every later DELETE projects its matching
  * rows onto the ESTABLISHED key and verifies exactness — the rows the
  * projected key set would kill are counted against the rows the
  * predicate matches, and a mismatch (non-unique key colliding across
  * the predicate boundary) REFUSES the delete rather than
  * over-deleting. The guard and the tombstone commit run against ONE
  * pinned snapshot per attempt and the commit CASes on that exact
  * parent, so a concurrent commit between verify and commit loses the
  * CAS and the whole verify re-runs at the new pin — the same
  * analysis-pin discipline the graft MERGE/UPDATE commands use (the
  * old verify-then-commit window is closed). `DELETE FROM t` with no
  * predicate truncates: one
  * replace commit of an empty slice that re-declares the recorded
  * layout. Untranslatable predicates are refused at analysis
  * (`canDeleteWhere` false), so a DELETE never silently
  * under-deletes. */
final class GraftTable(
    private[ops] val root: String,
    private[ops] val table: String,
    private[ops] val txn: String,
    private[ops] val meta: TableMeta)
  extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  private val recordedSchema: StructType = meta.schema.getOrElse(
    throw new IllegalStateException(
      s"table '$table' predates recorded schemas — read it via " +
        "AtomicPublish.readTable"))

  override def name(): String = s"$table@$txn"

  override def schema(): StructType = recordedSchema

  override def partitioning(): Array[Transform] =
    meta.partitionCols.map { spec =>
      PartSpec.parse(spec) match {
        case None => Expressions.identity(spec)
        case Some(t) => t.kind match {
          case "days" => Expressions.days(t.src)
          case "months" => Expressions.months(t.src)
          case "years" => Expressions.years(t.src)
          case _ => Expressions.hours(t.src)
        }
      }
    }.toArray ++
      (if (meta.numBuckets > 0)
        Array[Transform](Expressions.bucket(meta.numBuckets,
          meta.bucketCols: _*))
      else Array.empty[Transform])

  override def properties(): util.Map[String, String] = {
    // the declared layout and invariants surface through DESCRIBE
    // TABLE EXTENDED / SHOW TBLPROPERTIES — the operator does not need
    // the Scala API to see what a table's manifest declares
    val layout = Seq(
      "partition-spec" -> meta.partitionCols.mkString(","),
      // owners still laid out under a PREVIOUS spec (drops to zero as
      // compaction rewrites them under the current one)
      "partition-spec.evolved-owners" ->
        (if (meta.ownerParts.isEmpty) "" else meta.ownerParts.size.toString),
      "statsBy" -> meta.statCols.mkString(","),
      "bloomBy" -> meta.bloomCols.mkString(","),
      "clusterBy" -> meta.clusterCols.mkString(","),
      "zOrder" -> (if (meta.clusterZOrder) "true" else ""),
      "bucketBy" -> (if (meta.numBuckets > 0)
        s"${meta.numBuckets}:${meta.bucketCols.mkString(",")}" else ""),
      "owners" -> meta.owners.size.toString
    ).filter(_._2.nonEmpty)
    val checks = meta.checks.toSeq.sortBy(_._1)
      .map { case (n, p) => s"check.$n" -> p }
    (Map("provider" -> "graft", "location" -> root, "version" -> txn) ++
      layout ++ checks).asJava
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, table, txn, meta, recordedSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(root, table, meta)

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall {
      case _: sources.AlwaysTrue => true
      case f => f.references.nonEmpty &&
        GraftCatalogRead.toColumn(recordedSchema, f).isDefined
    }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    // the pushed filters are CONJUNCTS: an AlwaysTrue among them is a
    // no-op term, not a truncate — only an all-AlwaysTrue (or empty)
    // array means unconditioned DELETE (the same over-delete hazard
    // the overwrite face guards against)
    if (filters.forall(_.isInstanceOf[sources.AlwaysTrue])) {
      // unconditioned DELETE = truncate: one replace commit of an empty
      // slice, recorded layout re-declared (same contract as overwrite)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], recordedSchema)
      GraftCatalogWrite.commitLoop(spark, root, table, empty,
        overwrite = true, meta)
      return
    }
    val pred = filters.flatMap(GraftCatalogRead.toColumn(recordedSchema, _))
      .reduce(_ && _)
    val predCols = filters.flatMap(_.references).distinct.toIndexedSeq
    def cols(names: Seq[String]) = names.map(c =>
      org.apache.spark.sql.functions.col(s"`$c`"))
    // pin one snapshot per attempt: the exactness guard and the
    // tombstone commit both run against it, and the commit CASes on
    // that exact parent — a concurrent commit between verify and
    // commit now LOSES the CAS and re-runs the verify at the new pin
    // (the ADVICE-r6 verify-then-commit window, closed the way the
    // MERGE/UPDATE commands already do)
    var attempt = 0
    while (attempt < GraftSource.MaxCommitAttempts) {
      attempt += 1
      val (pinned, metas) = AtomicPublish.currentManifestMeta(spark, root)
        .getOrElse(throw new IllegalStateException(
          s"no published version under $root"))
      // the table's established tombstone key, if deletes happened before
      val established: Option[Seq[String]] = metas
        .get(AtomicPublish.deleteTableOf(table))
        .filter(_.owners.nonEmpty)
        .flatMap(_.schema)
        .map(_.fieldNames.toSeq.filterNot(_ == "_asof"))
      val keyCols = established.getOrElse(predCols)
      val live = AtomicPublish.readTableAt(spark, root, table, pinned)
      val matching = live.filter(pred)
      val keys = matching.select(cols(keyCols): _*).distinct()
      if (established.isDefined && keyCols.toSet != predCols.toSet) {
        // exactness guard: the key set must kill precisely the matching
        // rows — a non-unique key colliding across the predicate
        // boundary would over-delete, so it refuses instead
        val wouldKill = live.join(keys, keyCols, "left_semi").count()
        val matches = matching.count()
        require(wouldKill == matches,
          s"DELETE on '$table' projects onto the established tombstone " +
            s"key (${keyCols.mkString(", ")}), but that key would remove " +
            s"$wouldKill rows where the predicate matches $matches — " +
            "refusing rather than over-deleting. Use a predicate keyed " +
            "by the established columns, or compact the table to clear " +
            "its tombstones first")
      }
      if (AtomicPublish.deleteRowsAt(spark, root, pinned,
          Map(table -> keys)).isDefined) return
      // CAS lost: re-pin and re-verify against the new snapshot
    }
    throw new IllegalStateException(
      s"DELETE on '$table' lost the commit race " +
        s"${GraftSource.MaxCommitAttempts} times")
  }
}

/** Scan builder: top-level column pruning + conjunctive filter capture.
  * Every pushed filter is ALSO returned as post-scan (Spark re-applies
  * it above) — the push is a pruning HINT to the inner
  * [[GraftFileIndex]] plan, which already re-evaluates predicates
  * exactly; double evaluation of a row-local predicate is noise next to
  * the file-skipping it buys, and returning everything keeps
  * correctness independent of the filter translation. */
final class GraftScanBuilder(root: String, table: String, txn: String,
    meta: TableMeta, full: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f =>
      GraftCatalogRead.toColumn(full, f).isDefined)
    filters // all post-scan: see class doc
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // top-level pruning only: serve the FULL column for each requested
    // name (nested pruning would have to survive the V1 boundary;
    // parquet still prunes nested fields inside the inner scan)
    required = StructType(requiredSchema.fieldNames.toIndexedSeq
      .flatMap(n => full.fields.find(_.name == n)))

  override def build(): Scan =
    new GraftV1Scan(root, table, txn, meta, required, pushed)
}

/** The compatibility scan: `toV1TableScan` hands Spark a relation whose
  * `buildScan()` executes the delete-aware store read as an INNER plan
  * and returns its `InternalRow` RDD directly (`needConversion =
  * false`, the JDBC-v2 route) — so the vectorized parquet reader and
  * every skipping layer run inside, and the outer plan consumes rows
  * without a conversion pass. */
final class GraftV1Scan(root: String, table: String, txn: String,
    meta: TableMeta, out: StructType, pushed: Array[Filter])
  extends V1Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = out

  override def description(): String =
    s"graft $table@$txn pushed=[${pushed.mkString(", ")}]"

  /** Real bytes from the snapshot's file listing, so the PRE-pushdown
    * relation reports true size instead of `defaultSizeInBytes`
    * (= Long.MaxValue — "never broadcastable"). Post-pushdown Spark
    * wraps this scan in its `V1ScanWrapper`, which does not forward
    * the statistics interface, so planning-time join sizing falls back
    * to the conservative default there — at scale AQE's runtime
    * re-plan (real shuffle sizes) is the decision that matters, and a
    * too-large static estimate can only miss a broadcast, never OOM
    * one. Tombstoned rows are included (merge-on-read): an
    * over-estimate is the safe direction for size-based decisions. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val size =
      try java.util.OptionalLong.of(
        new GraftFileIndex(SparkSession.active, root, table, meta,
          meta.owners.map(_ -> None)).sizeInBytes)
      catch { case scala.util.control.NonFatal(_) =>
        java.util.OptionalLong.empty() }
    // manifest row count (tombstones included — the safe over-estimate)
    // when every owner carries segment stats; the native-mount path
    // (StoreRelation.catalogStatsOf) additionally reports per-column
    // NDV/null/min-max, which this V1Scan boundary cannot forward
    val rows =
      if (meta.owners.forall(meta.segStats.contains))
        java.util.OptionalLong.of(
          meta.owners.flatMap(meta.segStats.get).map(_.rows).sum)
      else java.util.OptionalLong.empty()
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      ctx: SQLContext): T =
    new GraftV1Relation(ctx, root, table, txn, out, pushed)
      .asInstanceOf[T]
}

final class GraftV1Relation(ctx: SQLContext, root: String, table: String,
    txn: String, out: StructType, pushed: Array[Filter])
  extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = out
  override def needConversion: Boolean = false

  override def buildScan(): RDD[Row] = {
    val spark = ctx.sparkSession
    val base = AtomicPublish.readTableAt(spark, root, table, txn)
    val filtered = pushed.flatMap(GraftCatalogRead.toColumn(base.schema, _))
      .foldLeft(base)(_.filter(_))
    val projected =
      if (out.fieldNames.isEmpty) filtered.select()
      else filtered.select(out.fieldNames.toIndexedSeq.map(n =>
        col(s"`$n`")): _*)
    if (GraftCatalogRead.probeEnabled)
      GraftCatalogRead.lastInnerScan = Some(projected)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

private[graft] object GraftCatalogRead {

  /** Opt-in switch for [[lastInnerScan]]: production catalog reads
    * retain nothing unless a spec/rehearsal flips this on (VERDICT-r6
    * ADVICE — an always-on global retained the last query's plan and
    * raced under concurrent reads). */
  @volatile private[graft] var probeEnabled = false

  /** TEST PROBE ONLY (gated by [[probeEnabled]]): the most recent
    * inner scan a catalog read built. The outer plan shows a single
    * row-source leaf, so a spec pinning "the catalog pruned to the
    * same file subset the side-channel does" needs the inner plan's
    * `numFiles` metric — this is the only way to reach it from outside
    * ([[graft.ScaleRehearsal]] uses it too, to assert catalog point
    * reads prune at a 1000-segment history). Never read by production
    * code. */
  @volatile private[graft] var lastInnerScan: Option[DataFrame] = None

  /** Conservative `sources.Filter` → `Column` translation: `None` for
    * anything not understood (the filter still runs post-scan; only the
    * pruning hint is lost). Attributes must name a top-level column of
    * the schema — dotted nested paths are skipped rather than
    * mis-resolved against a column whose name contains a dot. */
  def toColumn(schema: StructType, f: Filter): Option[Column] = {
    def attr(a: String): Option[Column] =
      if (schema.fieldNames.contains(a)) Some(col(s"`$a`")) else None
    f match {
      case sources.EqualTo(a, v) => attr(a).map(_ === lit(v))
      case sources.EqualNullSafe(a, v) => attr(a).map(_ <=> lit(v))
      case sources.GreaterThan(a, v) => attr(a).map(_ > lit(v))
      case sources.GreaterThanOrEqual(a, v) => attr(a).map(_ >= lit(v))
      case sources.LessThan(a, v) => attr(a).map(_ < lit(v))
      case sources.LessThanOrEqual(a, v) => attr(a).map(_ <= lit(v))
      case sources.In(a, vs) =>
        attr(a).map(_.isin(vs.toIndexedSeq.map(lit): _*))
      case sources.IsNull(a) => attr(a).map(_.isNull)
      case sources.IsNotNull(a) => attr(a).map(_.isNotNull)
      case sources.StringStartsWith(a, v) =>
        attr(a).map(_.startsWith(v))
      case sources.StringEndsWith(a, v) => attr(a).map(_.endsWith(v))
      case sources.StringContains(a, v) => attr(a).map(_.contains(v))
      case sources.And(l, r) =>
        for { a <- toColumn(schema, l); b <- toColumn(schema, r) }
          yield a && b
      case sources.Or(l, r) =>
        for { a <- toColumn(schema, l); b <- toColumn(schema, r) }
          yield a || b
      case sources.Not(c) => toColumn(schema, c).map(!_)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }
}

/** The NATIVE-READ upgrade for catalog tables, injected through
  * `spark.sql.extensions` ([[org.apache.spark.sql.graftvec
  * .GraftSqlExtensions]]): during analysis, every read of a
  * [[GraftTable]] is rewritten from the V2 relation to the SAME
  * delete-aware [[GraftFileIndex]] plan `readTable` builds — so on a
  * session with the extension installed, catalog SQL plans as a native
  * `FileSourceScan` (whole-stage codegen, vectorized parquet, dynamic
  * partition pruning / runtime filters — the pieces the [[GraftV1Scan]]
  * bridge structurally cannot receive through Spark's `V1ScanWrapper`).
  * Without the extension the V1 bridge still serves every read
  * correctly; this rule is the best-effort upgrade, not a correctness
  * dependency — the layering Delta Lake's catalog uses (a
  * DeltaTableV2 resolved by analyzer rules into a V1 LogicalRelation).
  *
  * Write commands are untouched: a `V2WriteCommand`'s target table is a
  * field, not a child, so the transform never reaches it and
  * `INSERT INTO` keeps the V2 write path. Row-level DML commands are
  * untouched EXPLICITLY: `DeleteFromTable`'s target (and
  * `UpdateTable`'s / `MergeIntoTable`'s) IS a child plan, and this rule
  * runs before Spark's `RewriteDeleteFromTable` — rewriting the target
  * would unhook `SupportsDelete` and SQL `DELETE FROM` would fail to
  * plan (and the graft MERGE/UPDATE commands need the original
  * relation). The snapshot pin (`txn`) travels with the table, so
  * `VERSION AS OF` reads rewrite to the matching historical plan. */
final class GraftNativeReadRule(spark: SparkSession)
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations that are the TARGET of a row-level DML command must
    // stay V2 relations (see class doc); collected by identity so the
    // same table read elsewhere in the statement still upgrades
    val dmlTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def mark(target: LogicalPlan): Unit = target.foreach {
      case r: DataSourceV2Relation => dmlTargets.add(r); ()
      case _ => ()
    }
    plan.foreach {
      case d: DeleteFromTable => mark(d.table)
      case u: UpdateTable => mark(u.table)
      case m: MergeIntoTable => mark(m.targetTable)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
          !dmlTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftTable]
        val native = AtomicPublish
          .readTableAt(spark, t.root, t.table, t.txn)
          .queryExecution.analyzed
        // graft the native plan under the V2 relation's attribute ids,
        // so references above the relation keep resolving
        Project(native.output.zip(r.output).map { case (from, to) =>
          Alias(from, to.name)(exprId = to.exprId)
        }, native)
    }
  }
}

/** `INSERT INTO` = atomic CAS-committed append; `INSERT OVERWRITE`
  * (truncate) = replace that RE-DECLARES the table's recorded layout,
  * so partitioning and stat/bloom columns survive the overwrite. */
final class GraftWriteBuilder(root: String, table: String,
    meta: TableMeta) extends WriteBuilder with SupportsTruncate
    with SupportsOverwrite {

  private var overwrite = false
  private var replaceWhere: Option[String] = None

  override def truncate(): WriteBuilder = {
    overwrite = true; replaceWhere = None; this
  }

  /** `INSERT OVERWRITE t PARTITION (…)` / `df.writeTo(t)
    * .overwrite(cond)` — PREDICATE-SCOPED overwrite: the pushed V1
    * filters translate to one predicate and the write routes through
    * [[AtomicPublish.overwriteWhere]] (only segments that can hold
    * matching rows rewrite; replacement rows are row-guarded to
    * satisfy the predicate). An always-true filter set degrades to
    * the full-replace (truncate) path. */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    // the pushed filters are CONJUNCTS: an AlwaysTrue among them is a
    // no-op term, not a truncate — only an all-AlwaysTrue (or empty)
    // array means full overwrite. Treating `exists` as truncate would
    // discard the remaining conjuncts and over-delete.
    val conjuncts = filters.toSeq
      .filterNot(_.isInstanceOf[sources.AlwaysTrue])
    if (conjuncts.isEmpty) {
      overwrite = true; replaceWhere = None
    } else {
      val conds = conjuncts.map { f =>
        GraftWriteBuilder.filterSql(f).getOrElse(
          throw new UnsupportedOperationException(
            s"INSERT OVERWRITE on '$table': filter $f is not " +
              "translatable to a scoped overwrite predicate"))
      }
      replaceWhere = Some(conds.mkString("(", ") AND (", ")"))
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ow: Boolean): Unit =
          replaceWhere match {
            case Some(where) =>
              AtomicPublish.overwriteWhere(data.sparkSession, root,
                table, data, where)
              ()
            case None =>
              GraftCatalogWrite.commitLoop(data.sparkSession, root,
                table, data, overwrite || ow, meta)
          }
      }
  }
}

private[ops] object GraftWriteBuilder {

  /** One pushed V1 [[Filter]] as a SQL predicate string — the grammar
    * [[AtomicPublish.overwriteWhere]] consumes (it re-parses for both
    * zone-map pruning and the exact row filter). Literals render
    * through Catalyst's `Literal.sql` (typed, re-parseable); nested
    * (dotted) references and string-match filters translate to None —
    * the caller refuses rather than over- or under-scoping. */
  private[ops] def filterSql(f: Filter): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CLit}
    def lit(v: Any): String = CLit(v).sql
    // identifiers quote via Spark's own rule (backtick doubling) so a
    // name containing a backtick round-trips through the re-parse
    // instead of producing a mis-scoped predicate string
    def q(c: String): Option[String] =
      if (c.contains(".")) None
      else Some(org.apache.spark.sql.catalyst.util.QuotingUtils
        .quoteIdentifier(c))
    f match {
      case sources.EqualTo(c, v) => q(c).map(n => s"$n = ${lit(v)}")
      case sources.EqualNullSafe(c, v) =>
        q(c).map(n => s"$n <=> ${lit(v)}")
      case sources.GreaterThan(c, v) => q(c).map(n => s"$n > ${lit(v)}")
      case sources.GreaterThanOrEqual(c, v) =>
        q(c).map(n => s"$n >= ${lit(v)}")
      case sources.LessThan(c, v) => q(c).map(n => s"$n < ${lit(v)}")
      case sources.LessThanOrEqual(c, v) =>
        q(c).map(n => s"$n <= ${lit(v)}")
      case sources.In(c, vs) if vs.nonEmpty =>
        q(c).map(n => s"$n IN (${vs.map(lit).mkString(", ")})")
      case sources.IsNull(c) => q(c).map(n => s"$n IS NULL")
      case sources.IsNotNull(c) => q(c).map(n => s"$n IS NOT NULL")
      case sources.And(l, r) => for { a <- filterSql(l); b <- filterSql(r) }
        yield s"($a AND $b)"
      case sources.Or(l, r) => for { a <- filterSql(l); b <- filterSql(r) }
        yield s"($a OR $b)"
      case sources.Not(x) => filterSql(x).map(a => s"(NOT $a)")
      case _ => None
    }
  }
}

private[ops] object GraftCatalogWrite {

  /** The write-face CAS loop ([[GraftSource.createRelation]]'s
    * contract) for catalog inserts: re-pin the parent and retry on a
    * lost race; overwrite replaces while re-declaring the RECORDED
    * layout (from the load-time meta — the manifest owns layout). */
  def commitLoop(spark: SparkSession, root: String, table: String,
      data: DataFrame, overwrite: Boolean, meta: TableMeta): Unit = {
    def layout(of: Seq[String]): Map[String, Seq[String]] =
      if (of.isEmpty) Map.empty else Map(table -> of)
    var attempt = 0
    while (attempt < GraftSource.MaxCommitAttempts) {
      attempt += 1
      AtomicPublish.currentTxn(spark, root) match {
        case None =>
          AtomicPublish.publish(spark, root, Map(table -> data),
            partitionBy = layout(meta.partitionCols),
            statsBy = layout(meta.statCols),
            bloomBy = layout(meta.bloomCols))
          return
        case Some(parent) =>
          val committed =
            if (overwrite)
              AtomicPublish.publishDelta(spark, root, append = Map.empty,
                replace = Map(table -> data), parent = Some(parent),
                partitionBy = layout(meta.partitionCols),
                statsBy = layout(meta.statCols),
                bloomBy = layout(meta.bloomCols))
            else
              // caller-supplied rows: a lost race REBASES (the sealed
              // segment lands on the winner's manifest, no restaging)
              // unless a table fact moved — then the loop recomputes
              AtomicPublish.publishDelta(spark, root,
                append = Map(table -> data), parent = Some(parent),
                rebase = true)
          if (committed.isDefined) return
        // CAS lost: re-pin and retry
      }
    }
    throw new IllegalStateException(
      s"catalog insert into '$table' lost the commit race " +
        s"${GraftSource.MaxCommitAttempts} times")
  }
}
