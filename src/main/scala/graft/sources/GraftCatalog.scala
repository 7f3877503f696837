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
  * Read-only like the provider: DDL/DML through the catalog is
  * refused with the Scala-API pointer — table creation is a guarded
  * commit-protocol concern (bucketing keys, CHECK constraints), not
  * something a bare `CREATE TABLE` statement can express safely.
  * Catalog metadata ops are driver-side directory listings (cheap,
  * object-store friendly); nothing reads data.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {
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

  private def fs: FileSystem =
    new Path(root).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  private def dirFor(ns: Array[String], table: String = ""): Path = {
    val parts = ns.toSeq ++ Option(table).filter(_.nonEmpty)
    parts.foldLeft(new Path(root))((p, n) => new Path(p, n))
  }

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_manifests"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirFor(namespace)
    if (!fs.exists(dir))
      throw new NoSuchNamespaceException((catalogName +: namespace).toSeq)
    fs.listStatus(dir).filter(st => st.isDirectory &&
        isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident.namespace(), ident.name())
    if (!isTableDir(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace().toSeq) :+ ident.name())
    val tx = GraftDataSource.openForRead(SparkSession.active, dir.toString)
    new GraftTable(dir.toString, tx.currentSchema)
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(dirFor(ident.namespace(), ident.name()))

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog is read-only ($op refused): create/write tables " +
        "through the Scala API's guarded commit protocol (graft.core.TxTable)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")

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
