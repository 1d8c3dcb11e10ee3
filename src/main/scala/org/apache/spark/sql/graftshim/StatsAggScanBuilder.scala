package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** DSv2 scan builder that answers whole-table `COUNT(*)` / `MIN` /
  * `MAX` aggregations from Delta log stats — the query compiles to a
  * [[LocalScan]] over ONE precomputed row, zero data files opened — and
  * delegates every other query untouched to Spark's own
  * [[ParquetScanBuilder]] (vectorized read, filter pushdown, column
  * pruning all unchanged).
  *
  * At 100 TB this turns `SELECT count(*) FROM tbl` from a full scan
  * into a metadata aggregation over the file list, the same answer
  * `Snapshot.statsRowCount` serves programmatically — but reached by
  * ANY engine-issued SQL through the normal DataFrame path. The
  * `answer` callback declines (returns None) whenever stats cannot
  * answer EXACTLY: pushed filters, group-bys, incomplete stats,
  * deletion vectors on min/max, non-primitive types, widened columns.
  *
  * Lives under org.apache.spark.sql because catalyst-level filter
  * pushdown ([[SupportsPushDownCatalystFilters]]) is sql-package-
  * private — the same reason Shims exists.
  */
final class StatsAggScanBuilder(
    delegate: ParquetScanBuilder,
    answer: Aggregation => Option[(StructType, Seq[Any])],
    partitionSchema: StructType = new StructType())
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates {

  private var local: Option[(StructType, Seq[Any])] = None
  private var anyFilters = false
  // Spark probes supportCompletePushDown then calls pushAggregation —
  // memoize per aggregation so the metadata jobs run once, not twice
  private var memo: Option[(Aggregation, Option[(StructType, Seq[Any])])] =
    None
  private def answered(agg: Aggregation): Option[(StructType, Seq[Any])] =
    memo match {
      case Some((a, r)) if a eq agg => r
      case _ =>
        val r = answer(agg)
        memo = Some((agg, r))
        r
    }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    // ANY pushed filter (even partition-only) invalidates global
    // stats answers — record and decline aggregation pushdown
    anyFilters ||= filters.nonEmpty
    delegate.pushFilters(filters)
  }
  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)

  // stats-unanswerable aggregations still fall through to the
  // delegate's OWN aggregate pushdown (parquet footer stats, behind
  // spark.sql.parquet.aggregatePushDown) — wrapping must not remove a
  // capability the bare builder had
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    (!anyFilters && answered(agg).isDefined) ||
      delegate.supportCompletePushDown(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (!anyFilters && answered(agg).isDefined) {
      local = answered(agg); true
    } else delegate.pushAggregation(agg)

  override def build(): Scan = local match {
    case Some((sch, vals)) => new LocalScan {
      override def readSchema(): StructType = sch
      override def rows(): Array[InternalRow] =
        Array(InternalRow.fromSeq(vals))
    }
    case None => delegate.build() match {
      // partitioned tables scan through the runtime-filtering wrapper
      // so star-schema joins dynamically prune partitions (Spark's own
      // ParquetScan does not implement SupportsRuntimeFiltering)
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
          if partitionSchema.nonEmpty =>
        new graft.delta.sources.RuntimeFilteredParquetScan(p, partitionSchema)
      case other => other
    }
  }
}
