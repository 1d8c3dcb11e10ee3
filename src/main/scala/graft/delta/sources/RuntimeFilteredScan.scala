package graft.delta.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.{expressions => cat}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType

/** Runtime (dynamic-partition) filtering for the native DSv2 path.
  *
  * Spark 4's `ParquetScan` does not implement
  * [[SupportsRuntimeFiltering]], so a DSv2 file source gets NO dynamic
  * partition pruning — a star-schema join against a filtered dim reads
  * every fact partition. This wrapper adds the interface: the
  * `PartitionPruning` optimizer rule then plants a DynamicPruning
  * subquery on the join key, and at execution `BatchScanExec` hands the
  * build side's key values to [[filter]], which folds them into the
  * inner scan's `partitionFilters`; the next `toBatch` re-lists through
  * [[GraftDeltaFileIndex]] with those filters, so only the surviving
  * partitions' files are ever planned. At 100 TB this is the difference
  * between scanning one day and scanning the whole table when the date
  * arrives through a join instead of a literal.
  *
  * Unsupported runtime-filter shapes are ignored — dropping a runtime
  * filter only reads more, never wrong results (the join still applies
  * the predicate row-level). */
final class RuntimeFilteredParquetScan(val inner: ParquetScan,
    partitionSchema: StructType)
    extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics
    with org.apache.spark.sql.internal.connector.SupportsMetadata {

  // the runtime-filtered image; starts as the planned scan
  @volatile private var current: ParquetScan = inner

  override def readSchema(): StructType = current.readSchema()
  override def toBatch: Batch = current.toBatch
  override def description(): String = current.description()
  override def estimateStatistics(): Statistics = current.estimateStatistics()
  override def supportedCustomMetrics(): Array[CustomMetric] =
    current.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    current.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    current.columnarSupportMode()
  // EXPLAIN FORMATTED's metadata block (ReadSchema/PushedFilters/
  // Location) comes through SupportsMetadata — losing it for every
  // partitioned scan would blind plan-audit tooling
  override def getMetaData(): Map[String, String] = current.getMetaData()

  override def filterAttributes(): Array[NamedReference] =
    partitionSchema.fieldNames.map(Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    RuntimeFilteredParquetScan.lastFilterCall.set(
      filters.map(_.toString).mkString("; "))
    val byName = partitionSchema.fields
      .map(f => f.name -> AttributeReference(f.name, f.dataType)()).toMap
    def translate(f: Filter): Option[Expression] = f match {
      case In(a, vs) => byName.get(a).map(attr =>
        cat.In(attr, vs.toIndexedSeq
          .map(v => Literal.create(v, attr.dataType))))
      case EqualTo(a, v) => byName.get(a).map(attr =>
        cat.EqualTo(attr, Literal.create(v, attr.dataType)))
      case _ => None
    }
    val exprs = filters.toIndexedSeq.flatMap(translate)
    if (exprs.nonEmpty)
      current = inner.copy(
        partitionFilters = inner.partitionFilters ++ exprs)
  }

  // equality on the PRE-runtime-filter image: plan canonicalization and
  // exchange reuse must see two scans of the same table/filters as
  // equal regardless of runtime-filter arrival order
  override def equals(o: Any): Boolean = o match {
    case r: RuntimeFilteredParquetScan => inner == r.inner
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode()
}

object RuntimeFilteredParquetScan {
  /** Test observability: the v1 Filters received by the most recent
    * runtime `filter` call in this JVM ("never" if none arrived). */
  private[graft] val lastFilterCall =
    new java.util.concurrent.atomic.AtomicReference[String]("never")
}
