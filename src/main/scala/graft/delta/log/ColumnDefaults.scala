package graft.delta.log

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Column DEFAULT values — the `allowColumnDefaults` writer feature:
  * a column's `CURRENT_DEFAULT` (SQL text in the field metadata, the
  * ecosystem-standard key) is materialized at WRITE time into any
  * batch that omits the column. Per the spec, defaults never rewrite
  * history: rows written before the default was set (or by writers
  * that provided the column) keep their values, and files missing the
  * column read NULL as always — which is why SET DEFAULT is only
  * allowed on EXISTING columns (a brand-new column with a default
  * would read null for old files and the default for new ones, two
  * answers for "the same" column).
  *
  * Write-time materialization costs one projected expression per
  * defaulted column per omitting batch — no read-side work at all, so
  * the scan path is untouched at any scale.
  */
object ColumnDefaults {
  final val MetadataKey = "CURRENT_DEFAULT"
  final val Feature = "allowColumnDefaults"

  /** (column, default SQL) for every defaulted column. */
  def of(meta: Actions.Metadata): Seq[(String, String)] =
    meta.dataSchema.fields.toSeq
      .filter(_.metadata.contains(MetadataKey))
      .map(f => f.name -> f.metadata.getString(MetadataKey))

  /** Fill omitted default-bearing columns (write path; the frame keeps
    * its own value when it provides the column). */
  def complete(df: DataFrame, meta: Actions.Metadata): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    of(meta).filterNot { case (name, _) => present(name.toLowerCase) }
      .foldLeft(df) { case (d, (name, sql)) =>
        d.withColumn(name,
          expr(sql).cast(meta.dataSchema(name).dataType))
      }
  }
}
