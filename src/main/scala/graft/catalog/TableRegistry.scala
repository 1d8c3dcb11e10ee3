package graft.catalog

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.delta.{DeltaTable, Snapshot}

/** Auto-refreshing Delta table registry.
  *
  * Mirrors the reference's DeltaLakeSchemaProvider: `table(name)`
  * re-resolves the snapshot on every lookup and swaps the provider when
  * a newer version exists (reference: crates/datafusion/src/
  * schema_provider.rs:83-118).
  */
final class TableRegistry(spark: SparkSession) {

  private case class Entry(path: String, snapshot: Snapshot)
  private val tables = new ConcurrentHashMap[String, Entry]()

  /** Register a Delta table under `name` and expose it as a temp view. */
  def register(name: String, path: String): Snapshot = {
    val snap = DeltaTable.forPath(spark, path)
    tables.put(name, Entry(path, snap))
    snap.read.createOrReplaceTempView(name)
    snap
  }

  /** Lookup with refresh-on-access: if the log has moved past the cached
    * version, re-resolve and re-publish the temp view. */
  def table(name: String): DataFrame = snapshot(name).read

  def snapshot(name: String): Snapshot = {
    val entry = Option(tables.get(name)).getOrElse(
      throw new IllegalArgumentException(s"Unknown delta table: $name"))
    val latest = DeltaTable.forPath(spark, entry.path)
    if (latest.version > entry.snapshot.version) {
      tables.put(name, Entry(entry.path, latest))
      latest.read.createOrReplaceTempView(name)
      latest
    } else entry.snapshot
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keys.asScala.toSeq.sorted
  }

  def unregister(name: String): Unit = {
    tables.remove(name)
    spark.catalog.dropTempView(name)
  }
}
