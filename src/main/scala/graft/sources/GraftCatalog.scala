package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 TABLE CATALOG over a warehouse root directory — the missing
  * half of the SQL surface: with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.lake.root", "/data/warehouse")
  * spark.sql("SELECT ... FROM lake.sales")          // root/sales
  * spark.sql("SELECT ... FROM lake.raw.events")     // root/raw/events
  * }}}
  *
  * SQL addresses transactional tables by IDENTIFIER, no manual view
  * registration. Identifiers map to directories (namespace = nested
  * subdirectories), each resolved through [[GraftDataSource]]'s
  * pinned-snapshot [[GraftTable]] — so every query gets snapshot
  * isolation and manifest pruning exactly as `format("graft")` does.
  *
  * DDL/DML surface: `CREATE TABLE … TBLPROPERTIES('keys'='…')`,
  * `INSERT INTO` / `INSERT OVERWRITE`, `DROP TABLE` (a guarded
  * manifest tombstone — data and history stay retained, undoable via
  * `TxTable.undropTable`), and `ALTER TABLE … ADD COLUMNS` (the
  * schema-evolution path). Creation and writes route through the
  * guarded commit protocol (the write bridge in
  * [[GraftWriteBuilder]]), so SQL pays the same CHECK admission,
  * bucketing and CAS as the Scala API. `RENAME TO` is one atomic
  * directory rename (manifests are table-relative). Catalog metadata
  * ops are driver-side directory listings (cheap, object-store
  * friendly); nothing reads data.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with StagingTableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"graft catalog '$name' needs spark.sql.catalog.$name.root=<dir>")
  }
  override def name(): String = catalogName

  /** Column DEFAULT values are supported (CREATE-time defaults and
    * ALTER COLUMN SET/DROP DEFAULT): the analyzer then resolves
    * omitted insert columns from the schema's `CURRENT_DEFAULT`
    * metadata, which our declared schemas persist verbatim. IDENTITY
    * columns likewise: the parser's `identity.*` column metadata
    * persists in the declared schema, and the write path allocates
    * from a CAS'd high-water mark (TxTable's identity section). */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)

  private def fs: FileSystem =
    new Path(root).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  private def dirFor(ns: Array[String], table: String = ""): Path = {
    val parts = ns.toSeq ++ Option(table).filter(_.nonEmpty)
    parts.foldLeft(new Path(root))((p, n) => new Path(p, n))
  }

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_manifests"))

  /** A LIVE table dir: physically present, not carrying the
    * `_dropped` marker (DROP TABLE keeps data + history retained; the
    * catalog just stops serving it), and not an in-flight/orphaned
    * CTAS staging dir (`_staging` — invisible until
    * `commitStagedChanges` removes the marker, so an atomic CTAS never
    * leaks a half-created table even if the driver dies). Three
    * `exists` calls per table — O(1), never a manifest read. */
  private def isLiveTableDir(p: Path): Boolean =
    isTableDir(p) &&
      !fs.exists(new Path(p, graft.core.TxTable.DroppedMarker)) &&
      !fs.exists(new Path(p, GraftCatalog.StagingMarker))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirFor(namespace)
    if (!fs.exists(dir))
      throw new NoSuchNamespaceException((catalogName +: namespace).toSeq)
    fs.listStatus(dir).filter(st => st.isDirectory &&
        isLiveTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident.namespace(), ident.name())
    if (!isLiveTableDir(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace().toSeq) :+ ident.name())
    // null schema = GraftTable derives it from ITS OWN pinned version
    // (one open resolves pin + schema together — no TOCTOU window for
    // a schema-evolving commit between two listings)
    new GraftTable(dir.toString, null)
  }

  /** `SELECT … FROM lake.t VERSION AS OF <v|'ref'>` — pin an exact
    * retained version (read-only relation; schema is the one that
    * version was committed with). A non-numeric version string is a
    * NAMED REF: it resolves through the table's tag ledger
    * (`TxTable.resolveRef`), so `VERSION AS OF 'audited-2026q3'`
    * reads the pinned snapshot for as long as the tag exists. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirFor(ident.namespace(), ident.name())
    if (!isLiveTableDir(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace().toSeq) :+ ident.name())
    val v =
      if (version.nonEmpty && version.forall(_.isDigit)) version.toLong
      else GraftDataSource.openForRead(SparkSession.active, dir.toString)
        .resolveRef(version)
    new GraftTable(dir.toString, null, Some(v))
  }

  /** `SELECT … FROM lake.t TIMESTAMP AS OF <ts>` — DSv2 hands the
    * instant as MICROSECONDS since epoch; it resolves to the latest
    * version committed at or before it (manifest publish times). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirFor(ident.namespace(), ident.name())
    if (!isLiveTableDir(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace().toSeq) :+ ident.name())
    val tx = GraftDataSource.openForRead(SparkSession.active, dir.toString)
    val v = tx.versionAsOfTimestamp(timestamp / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no commit of $dir at or before timestamp $timestamp (micros)"))
    new GraftTable(dir.toString, null, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean =
    isLiveTableDir(dirFor(ident.namespace(), ident.name()))

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog refuses destructive DDL ($op): drop/rename tables " +
        "through the Scala API's guarded commit protocol (graft.core.TxTable)")

  /** `CREATE TABLE lake.t (cols) TBLPROPERTIES('keys'='k1,k2'
    * [, 'buckets'='16'][, 'blooms'='c1,c2'])` — the bucketing keys are
    * a REQUIRED property because they are the table's physical
    * identity (manifest partitioner, bucket pruning, upsert
    * co-location); a bare CREATE TABLE cannot guess them safely.
    * Creation commits v0 through the normal protocol, which also
    * records the `_table.json` descriptor that later SQL inserts
    * bucket by. */
  /** (keys, buckets, blooms) from TBLPROPERTIES, validated against
    * the declared schema. */
  private def layoutProps(schema: StructType,
      properties: JMap[String, String]): (Seq[String], Int, Seq[String]) = {
    val keys = Option(properties.get("keys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        "CREATE TABLE needs TBLPROPERTIES('keys'='k1,k2'" +
          "[, 'buckets'='16'][, 'blooms'='c1,c2'])"))
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"key column '$k' is not in the table schema"))
    val buckets = Option(properties.get("buckets")).map(_.toInt).getOrElse(16)
    val blooms = Option(properties.get("blooms"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    (keys, buckets, blooms)
  }

  /** Shared CREATE body: refuse existing/dropped dirs, commit v0 with
    * the descriptor, return the created TxTable. A pre-existing
    * NON-EMPTY directory at the target is refused outright — it is a
    * namespace (or foreign) directory, and creating a table inside it
    * would make the statement's cleanup paths able to touch data the
    * statement did not create. */
  private def createTx(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String],
      staged: Boolean = false): graft.core.TxTable = {
    require(partitions.isEmpty,
      "graft tables take no PARTITIONED BY - physical layout comes from " +
        "the 'keys'/'buckets' table properties (manifest bucketing)")
    // identity allocation strides by partition id in a 64-bit space;
    // fail the narrow type at CREATE, not on the first insert
    schema.fields.filter(_.metadata.contains(
        graft.core.TxTable.IdentityStartKey)).foreach(f => require(
      f.dataType == org.apache.spark.sql.types.LongType,
      s"identity column '${f.name}' must be BIGINT, " +
        s"got ${f.dataType.simpleString}"))
    val (keys, buckets, blooms) = layoutProps(schema, properties)
    val dir = dirFor(ident.namespace(), ident.name())
    // the staging check runs FIRST and regardless of _manifests: a
    // crash between marker and v0 leaves marker-only debris that must
    // still get the curated remedy, not a generic refusal
    if (fs.exists(new Path(dir, GraftCatalog.StagingMarker)))
      throw new IllegalStateException(
        s"$dir holds the staging directory of an in-flight or " +
          "crashed CTAS - wait for it, or delete the directory if " +
          "its statement is known dead")
    if (isTableDir(dir)) {
      if (!isLiveTableDir(dir)) throw new IllegalStateException(
        s"table directory $dir holds a DROPPED table whose history is " +
          "retained - undropTable() via the Scala API (graft.core.TxTable) " +
          "to restore it, vacuum it away, or pick another name")
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (catalogName +: ident.namespace().toSeq) :+ ident.name())
    }
    if (staged)
      // a staged CTAS must own its directory OUTRIGHT (abort deletes
      // it recursively): adopting even an EMPTY pre-existing dir would
      // let abort race concurrent content created inside it
      require(!fs.exists(dir),
        s"$dir already exists - CTAS creates its own directory " +
          "(CREATE TABLE then INSERT to use a pre-created one)")
    else require(!fs.exists(dir) || fs.listStatus(dir).isEmpty,
      s"$dir exists and is not empty - it is a namespace (or foreign) " +
        "directory; pick another table name")
    if (staged) {
      // marker BEFORE the v0 commit: the table must never be visible
      // (or survivable as live debris) until commitStagedChanges
      fs.mkdirs(dir)
      val out = fs.create(new Path(dir, GraftCatalog.StagingMarker), false)
      out.close()
    }
    val tx = new graft.core.TxTable(SparkSession.active, dir.toString,
      schema, keys, numBuckets = buckets, bloomCols = blooms)
    tx.createIfAbsent() // v0 commit writes #schema + _table.json
    tx
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val tx = createTx(ident, schema, partitions, properties)
    new GraftTable(tx.dir, schema)
  }

  /** Spark's own `Column[]` → `StructType` conversion (behind
    * TableInfo and the modern createTable) encodes comments and
    * column DEFAULTs but DROPS the identity spec and the generation
    * expression — the connector is expected to read them off the
    * Column API (the Delta recipe). Re-attach them as the
    * `identity.*` / `graft.generatedExpr` metadata keys TxTable's
    * write path allocates/computes from. */
  private def schemaOf(columns: Array[Column]): StructType = {
    val base = GraftCatalogShims.v2ColumnsToStructType(columns)
    val withMeta = StructType(base.fields.zip(columns).map { case (f, c) =>
      (Option(c.identityColumnSpec()), Option(c.generationExpression())) match {
        case (None, None) => f
        case (Some(spec), _) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong(graft.core.TxTable.IdentityStartKey, spec.getStart)
            .putLong(graft.core.TxTable.IdentityStepKey, spec.getStep)
            .putBoolean(graft.core.TxTable.IdentityAllowExplicitKey,
              spec.isAllowExplicitInsert)
            .build())
        case (None, Some(gen)) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(graft.core.TxTable.GeneratedExprKey, gen)
            .build())
      }
    })
    validateGenerated(withMeta)
    withMeta
  }

  /** CREATE-time validation of every `GENERATED ALWAYS AS (expr)`
    * column — the shared validator
    * ([[graft.core.TxTable.validateGeneratedExprs]], also run by the
    * Scala API's createIfAbsent): a bad expression must fail the DDL,
    * never the first insert. */
  private def validateGenerated(schema: StructType): Unit =
    graft.core.TxTable.validateGeneratedExprs(SparkSession.active, schema)

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: JMap[String, String]): Table =
    createTable(ident, schemaOf(columns), partitions, properties)

  /** CTAS through the staging API with REAL atomic visibility: the
    * table directory is created with a `_staging` marker that keeps
    * it INVISIBLE to every catalog path (loadTable / tableExists /
    * SHOW TABLES) until `commitStagedChanges` removes the marker —
    * so a concurrent reader never sees a half-created table, and a
    * driver death mid-CTAS leaves only an invisible staging dir (a
    * later CREATE names it and the remedy). An abort deletes the
    * directory, which the non-empty-target refusal in `createTx`
    * guarantees this statement created. */
  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable = {
    val s = schemaOf(info.columns()) // identity spec survives CTAS too
    val tx = createTx(ident, s, info.partitions(),
      info.properties(), staged = true)
    new StagedGraftTable(tx, s, replace = false,
      stagingMarker =
        Some(new Path(tx.dir, GraftCatalog.StagingMarker).toString))
  }

  /** `REPLACE TABLE … AS SELECT` — NOT drop-and-recreate: ONE guarded
    * `replaceRedefining` commit adopts the new schema and rows with
    * the table's history retained (time travel below the replace
    * reads the old definition; abort = `restore()` to the pre-replace
    * version). The physical layout is immutable through REPLACE: keys
    * / buckets / blooms in the new TBLPROPERTIES must match the
    * existing descriptor (changing them is `rebucketTo` territory —
    * a fresh directory, stated in the refusal). */
  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    require(info.partitions().isEmpty,
      "graft tables take no PARTITIONED BY - physical layout comes from " +
        "the 'keys'/'buckets' table properties (manifest bucketing)")
    val dir = dirFor(ident.namespace(), ident.name())
    if (!isLiveTableDir(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace().toSeq) :+ ident.name())
    val tx = GraftDataSource.openForRead(SparkSession.active, dir.toString)
    require(!tx.keys.contains("__reader__"),
      s"$dir has no _table.json write descriptor - REPLACE needs the " +
        "key columns to keep the physical identity")
    // TBLPROPERTIES may restate the layout; it must MATCH (the layout
    // is the table's physical identity, a replace keeps it). Key
    // comparison is case-insensitive, like every other key resolution.
    Option(info.properties().get("keys")).foreach { p =>
      val asked = p.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val lk = tx.logicalKeys // users state the DECLARED key names
      require(asked.length == lk.length &&
          asked.zip(lk).forall { case (a, k) => a.equalsIgnoreCase(k) },
        s"REPLACE cannot change keys (${lk.mkString(",")} -> " +
          s"${asked.mkString(",")}) - migrate with rebucketTo")
    }
    Option(info.properties().get("buckets")).foreach(b =>
      require(b.toInt == tx.numBuckets,
        s"REPLACE cannot change bucket count (${tx.numBuckets} -> $b) " +
          "- migrate with rebucketTo"))
    Option(info.properties().get("blooms")).foreach { p =>
      // SET compare: bloom columns are unordered (one sidecar each)
      val asked = p.split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.toLowerCase).toSet
      require(asked == tx.bloomCols.map(_.toLowerCase).toSet,
        s"REPLACE cannot change bloom columns " +
          s"(${tx.bloomCols.mkString(",")} -> $p) " +
          "- migrate with rebucketTo")
    }
    // schemaOf, not info.schema(): Spark's Column[] conversion drops
    // the identity spec (and generation expression), so a REPLACE
    // restating `GENERATED ALWAYS AS IDENTITY` would otherwise lose
    // the declaration silently and later inserts would land NULL ids
    val replSchema = schemaOf(info.columns())
    tx.logicalKeys.foreach(k => require(
      replSchema.fieldNames.exists(_.equalsIgnoreCase(k)),
      s"REPLACE schema must keep key column '$k'"))
    new StagedGraftTable(tx, replSchema, replace = true,
      stagingMarker = None)
  }

  override def stageCreateOrReplace(ident: Identifier,
      info: TableInfo): StagedTable = {
    val dir = dirFor(ident.namespace(), ident.name())
    if (isLiveTableDir(dir)) stageReplace(ident, info)
    else stageCreate(ident, info)
  }

  /** `ALTER TABLE …` surface, each verb on its honest mechanism:
    * ADD COLUMNS → metadata-only widened-schema commit (pre-evolution
    * files null-fill); DROP COLUMN → metadata-only narrowing commit
    * (resurrection-guarded); ALTER COLUMN TYPE → metadata-only type
    * widening (Spark 4's parquet readers upcast the narrower physical
    * type; lossless widenings only); RENAME COLUMN → one staged
    * REWRITE commit (without column-mapping metadata the physical
    * name is the binding identity — a metadata-only rename would null
    * the column out of every old file); SET/UNSET TBLPROPERTIES →
    * metadata-only commits on the properties map. Anything else is
    * refused with the Scala-API pointer. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident.namespace(), ident.name())
    if (!isLiveTableDir(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace().toSeq) :+ ident.name())
    val (dropChanges, rest0) = changes.partition(
      _.isInstanceOf[TableChange.DeleteColumn])
    val (renames, rest1) = rest0.partition(
      _.isInstanceOf[TableChange.RenameColumn])
    val (widens, rest2) = rest1.partition(
      _.isInstanceOf[TableChange.UpdateColumnType])
    val (setProps, rest3) = rest2.partition(
      _.isInstanceOf[TableChange.SetProperty])
    val (unsetProps, rest4) = rest3.partition(
      _.isInstanceOf[TableChange.RemoveProperty])
    val (setDefaults, rest5) = rest4.partition(
      _.isInstanceOf[TableChange.UpdateColumnDefaultValue])
    val (addCons, rest6) = rest5.partition(
      _.isInstanceOf[TableChange.AddConstraint])
    val (dropCons, rest) = rest6.partition(
      _.isInstanceOf[TableChange.DropConstraint])
    val adds = rest.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "graft tables are flat - nested ADD COLUMN is unsupported")
        require(a.isNullable,
          s"new column ${a.fieldNames().head} must be nullable " +
            "(existing rows null-fill)")
        // the Delta rule, for the Delta reason: a default on ADD
        // COLUMN would promise a value for EXISTING rows that the
        // files don't hold. Add the column (nulls), then ALTER
        // COLUMN SET DEFAULT for future inserts.
        require(a.defaultValue() == null,
          s"ADD COLUMN ${a.fieldNames().head} cannot carry a DEFAULT " +
            "- existing rows read null; ADD the column, then ALTER " +
            "COLUMN ... SET DEFAULT for future inserts")
        org.apache.spark.sql.types.StructField(
          a.fieldNames().head, a.dataType(), nullable = true)
      case other => readOnly(s"ALTER TABLE ${other.getClass.getSimpleName}")
    }
    val tx = GraftDataSource.openForRead(SparkSession.active, dir.toString)
    // one schema read for the whole statement (currentSchema re-lists
    // and re-parses the head manifest per call)
    lazy val curCols = tx.currentSchema.fieldNames
    val drops = dropChanges.map { case d: TableChange.DeleteColumn =>
      require(d.fieldNames().length == 1,
        "graft tables are flat - nested DROP COLUMN is unsupported")
      (d.fieldNames().head, Option(d.ifExists()).exists(_.booleanValue()))
    }.collect {
      // IF EXISTS: an absent column succeeds silently; a present one
      // (or a plain DROP COLUMN) goes through dropColumns, which
      // raises the honest error itself for the absent+required case
      case (n, ifExists)
          if !ifExists || curCols.exists(_.equalsIgnoreCase(n)) => n
    }
    if (adds.nonEmpty) tx.addColumns(StructType(adds))
    if (drops.nonEmpty) tx.dropColumns(drops)
    renames.foreach { case r: TableChange.RenameColumn =>
      require(r.fieldNames().length == 1,
        "graft tables are flat - nested RENAME COLUMN is unsupported")
      tx.renameColumn(r.fieldNames().head, r.newName())
    }
    widens.foreach { case w: TableChange.UpdateColumnType =>
      require(w.fieldNames().length == 1,
        "graft tables are flat - nested ALTER COLUMN is unsupported")
      tx.widenColumn(w.fieldNames().head, w.newDataType())
    }
    addCons.foreach { case a: TableChange.AddConstraint =>
      a.constraint() match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          // addCheckConstraint validates the predicate against every
          // EXISTING row and the staging choke point enforces it on
          // every later write — ENFORCED semantics, our machinery
          tx.addCheckConstraint(c.name(), c.predicateSql())
        case other => readOnly(
          s"ADD CONSTRAINT ${other.getClass.getSimpleName} " +
            "(only CHECK constraints are enforced; PK/FK/UNIQUE are " +
            "informational and not stored)")
      }
    }
    dropCons.foreach { case d: TableChange.DropConstraint =>
      if (!d.ifExists() || tx.checkConstraints.contains(d.name()))
        tx.dropCheckConstraint(d.name())
    }
    setDefaults.foreach { case d: TableChange.UpdateColumnDefaultValue =>
      require(d.fieldNames().length == 1,
        "graft tables are flat - nested ALTER COLUMN is unsupported")
      // DROP DEFAULT arrives as an empty default string
      val sql = Option(d.newDefaultValue()).map(_.trim).filter(_.nonEmpty)
      tx.setColumnDefault(d.fieldNames().head, sql)
    }
    val props = setProps.map { case p: TableChange.SetProperty =>
      p.property() -> p.value() }.toMap
    if (props.nonEmpty) tx.setTableProperties(props)
    val unsets = unsetProps.map { case p: TableChange.RemoveProperty =>
      p.property() }
    if (unsets.nonEmpty) tx.unsetTableProperties(unsets)
    loadTable(ident)
  }

  /** `DROP TABLE` = guarded manifest tombstone: the table vanishes
    * from this catalog but data + history stay retained
    * (`TxTable.undropTable()` restores; `vacuum` reclaims). */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident.namespace(), ident.name())
    if (!isLiveTableDir(dir)) false
    else {
      GraftDataSource.openForRead(SparkSession.active, dir.toString)
        .dropTable()
      true
    }
  }

  /** `ALTER TABLE … RENAME TO …` — one atomic directory rename:
    * manifests reference own files by BARE NAME and the Delta log is
    * table-relative, so relocation is metadata-only at any size
    * (`TxTable.relocateTo` holds the honesty guards: live branches,
    * published-branch absolute refs, exported Iceberg trees). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val src = dirFor(oldIdent.namespace(), oldIdent.name())
    if (!isLiveTableDir(src)) throw new NoSuchTableException(
      (catalogName +: oldIdent.namespace().toSeq) :+ oldIdent.name())
    val dst = dirFor(newIdent.namespace(), newIdent.name())
    GraftDataSource.openForRead(SparkSession.active, src.toString)
      .relocateTo(dst.toString)
    ()
  }

  // ---- functions: the bucket transform for storage-partitioned
  // joins (see GraftBucketFunction) ----
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"),
      Identifier.of(namespace, "iceberg_bucket"))
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else if (ident.name() == "iceberg_bucket") GraftIcebergBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  // ---- namespaces = nested directories ----
  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(new Path(root))
      .filter(st => st.isDirectory && !isTableDir(st.getPath) &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = dirFor(namespace)
    if (!fs.exists(dir))
      throw new NoSuchNamespaceException((catalogName +: namespace).toSeq)
    fs.listStatus(dir)
      .filter(st => st.isDirectory && !isTableDir(st.getPath) &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] = {
    if (namespace.nonEmpty && !fs.exists(dirFor(namespace)))
      throw new NoSuchNamespaceException((catalogName +: namespace).toSeq)
    java.util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = readOnly("CREATE NAMESPACE")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly("ALTER NAMESPACE")
  override def dropNamespace(namespace: Array[String], cascade: Boolean)
      : Boolean = readOnly("DROP NAMESPACE")
}

object GraftCatalog {
  /** Marker file keeping a CTAS target invisible to the catalog until
    * `commitStagedChanges` removes it (atomic-CTAS visibility; a
    * driver death leaves only an invisible staging dir). */
  val StagingMarker = "_staging"
}

/** The staged table behind CTAS / RTAS (`StagingTableCatalog`): the
  * query result arrives through the V1 write bridge and lands as ONE
  * guarded commit — `append` onto the freshly created v0 (CTAS,
  * invisible behind the `_staging` marker until commit) or
  * `replaceRedefining` (RTAS, history retained). `commitStagedChanges`
  * removes the CTAS marker (the visibility flip); a write-less
  * REPLACE (plain `REPLACE TABLE`) commits an empty redefinition
  * there instead. Abort undoes exactly what THIS statement did:
  * delete the directory a CTAS created (guaranteed ours by the
  * non-empty-target refusal), or `restore()` the pre-replace version
  * — but ONLY while the head is still this statement's own commit; a
  * concurrent writer's later commit is never rolled back. */
final class StagedGraftTable(tx: graft.core.TxTable,
    declaredSchema: StructType, replace: Boolean,
    stagingMarker: Option[String])
    extends StagedTable with SupportsWrite {
  import org.apache.spark.sql.connector.write._

  @volatile private var committedVersion: Option[Long] = None

  override def name(): String = s"graft-staged:`${tx.dir}`"
  override def schema(): StructType = declaredSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // RTAS plans arrive as truncate-then-write; the replace commit
      // already IS truncate+write in one, so the flag is absorbed
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation
            : org.apache.spark.sql.sources.InsertableRelation =
          new org.apache.spark.sql.sources.InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                overwrite: Boolean): Unit = {
              val conformed =
                GraftWriteBuilder.conformPositional(data, declaredSchema)
              if (replace)
                committedVersion =
                  Some(tx.replaceRedefining(conformed, declaredSchema))
              else
                // capture the version the append itself committed —
                // re-reading tx.currentVersion here is a TOCTOU (a
                // concurrent writer's commit would be recorded as ours)
                committedVersion = Some(tx.appendCommit(conformed))
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    if (replace && committedVersion.isEmpty) {
      // plain REPLACE TABLE (no AS SELECT): the new definition is an
      // empty table under the new schema
      val spark = SparkSession.active
      committedVersion = Some(tx.replaceRedefining(
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          declaredSchema),
        declaredSchema))
    }
    // visibility flip: the CTAS becomes a live catalog table HERE —
    // a failed flip must fail the statement loudly (reporting success
    // with the marker still present would leave the table permanently
    // invisible)
    stagingMarker.foreach { m =>
      val p = new Path(m)
      val f = p.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration)
      require(f.delete(p, false),
        s"could not remove the staging marker $m - the created table " +
          "is NOT visible; remove the marker to publish it")
    }
  }

  override def abortStagedChanges(): Unit =
    if (!replace) {
      // the CTAS created this directory (createTx refused a non-empty
      // target); a failed statement leaves nothing behind
      val p = new Path(tx.dir)
      val f = p.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration)
      f.delete(p, true)
      ()
    } else committedVersion match {
      // nothing of OURS landed (the query failed before the replace
      // commit) - touch nothing: the version may have advanced, but
      // only with OTHER writers' commits, which are not ours to undo
      case None => ()
      // our replace landed: roll back to the version it actually
      // stacked on (v-1, NOT the stage-time preVersion - a concurrent
      // commit may have landed in between and must survive), and only
      // while the head is still OUR commit; the guarded restore
      // abandons on a race instead of being rebased past a later
      // writer (a commit built on top of our replace makes the
      // rollback impossible without destroying acknowledged data, so
      // the replace - itself a complete valid commit - stands)
      case Some(v) => tx.restoreIfHead(expectedHead = v, v = v - 1)
    }
}
