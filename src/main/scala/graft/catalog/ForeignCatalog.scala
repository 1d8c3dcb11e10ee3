package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.delta.sources.GraftDeltaTable

/** DSv2 plugin for a FOREIGN CATALOG's data plane: the mounted system
  * is modeled as a directory tree reachable through the CONNECTION's
  * URL — `<root>/<schema>/<table>` holds a delta table — and name
  * resolution walks that layout the way the reference resolves Unity
  * Catalog tables to their storage locations through the catalog
  * service (crates/datafusion/src/schema_provider.rs:83-118; the REST
  * half is unreachable zero-egress, so the local tree stands in for
  * the remote system, the same argument as [[LocalCatalog]]).
  *
  * READ-ONLY by construction: the foreign system owns its tables, so
  * every DDL/DML entry point refuses. Lookups are lazy — a table is
  * resolved when referenced (fresh [[GraftDeltaTable]], snapshot at
  * scan planning), so mounts are cheap and the foreign side may grow
  * or shrink between queries with zero refresh calls.
  *
  * The root arrives via the conf option CREATE FOREIGN CATALOG binds
  * (`spark.sql.catalog.<name>.root`).
  */
final class ForeignCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: java.io.File = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null && r.nonEmpty,
      s"foreign catalog '$name': no root configured " +
        s"(spark.sql.catalog.$name.root)")
    root = new java.io.File(r)
    // deliberately NOT added to GraftCatalog.pluginNames: that set
    // feeds the flat local registry's name-stripping, and a foreign
    // catalog's tables live behind the connection, not in the registry
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** Resolve one path segment against the live directory — exact name
    * first, then case-insensitive (Spark SQL resolution is
    * case-insensitive by default and v2 catalogs own implementing it). */
  private def segment(parent: java.io.File,
      part: String): Option[java.io.File] = {
    val exact = new java.io.File(parent, part)
    if (exact.isDirectory) Some(exact)
    else Option(parent.listFiles()).toSeq.flatten
      .find(f => f.isDirectory && f.getName.equalsIgnoreCase(part))
  }

  private def namespaceDir(namespace: Array[String]): Option[java.io.File] =
    if (namespace.length != 1) None else segment(root, namespace(0))

  private def tableDir(ident: Identifier): Option[java.io.File] =
    for {
      ns <- namespaceDir(ident.namespace())
      t <- segment(ns, ident.name())
      if new java.io.File(t, "_delta_log").isDirectory
    } yield t

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespaceDir(namespace).getOrElse(
      throw new NoSuchNamespaceException(namespace))
    Option(ns.listFiles()).toSeq.flatten
      .filter(f => new java.io.File(f, "_delta_log").isDirectory)
      .map(_.getName).sorted
      .map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    tableDir(ident).isDefined

  override def loadTable(ident: Identifier): Table =
    tableDir(ident)
      .map(d => new GraftDeltaTable(spark, d.getAbsolutePath, None))
      .getOrElse(throw new NoSuchTableException(ident))

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"foreign catalog '$catalogName' is read-only: the mounted system " +
        s"owns its tables ($op refused)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")

  // ---- namespaces (the root's first-level directories) ---------------

  override def listNamespaces(): Array[Array[String]] =
    Option(root.listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName).sorted
      .map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceDir(namespace).isDefined) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespaceDir(namespace).isDefined

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] =
    if (namespaceDir(namespace).isDefined)
      java.util.Collections.emptyMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    readOnly("CREATE NAMESPACE")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    readOnly("ALTER NAMESPACE")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    readOnly("DROP NAMESPACE")
}
