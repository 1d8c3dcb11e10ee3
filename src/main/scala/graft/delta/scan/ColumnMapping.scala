package graft.delta.scan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.delta.log.Actions.Metadata

/** Column-mapping + physical/logical schema transforms.
  *
  * The logical schema is the user-facing one; the physical schema is what
  * sits in the parquet files (mapped names, possibly missing newly-added
  * columns). The reference applies a per-file kernel transform expression
  * (reference: crates/datafusion/src/table_provider/delta/exec.rs:176-214
  * and engine/schema_adapter/apply_schema.rs:21-234 — rename, impute
  * missing as null, cast, never reorder by position, match by name).
  * Spark's parquet reader already resolves by (physical) name and imputes
  * missing columns as nulls when given an explicit schema, so the
  * remaining work is the physical→logical rename, done recursively for
  * nested structs.
  */
object ColumnMapping {

  final val PhysicalNameKey = "delta.columnMapping.physicalName"
  final val ColumnMappingModeKey = "delta.columnMapping.mode"

  def mode(meta: Metadata): String =
    meta.configuration.getOrElse(ColumnMappingModeKey, "none")

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** Highest column-mapping field id anywhere in the schema, nested
    * struct/array/map fields included — the id high-water mark must see
    * ids an external writer assigned to nested fields, or a later ADD
    * COLUMN could collide with a live nested id. */
  def maxFieldId(schema: StructType): Long = {
    def fieldId(f: StructField): Long =
      if (f.metadata.contains("delta.columnMapping.id"))
        f.metadata.getLong("delta.columnMapping.id") else 0L
    def walk(dt: DataType): Long = dt match {
      case s: StructType =>
        if (s.fields.isEmpty) 0L
        else s.fields.map(f => math.max(fieldId(f), walk(f.dataType))).max
      case a: ArrayType => walk(a.elementType)
      case m: MapType => math.max(walk(m.keyType), walk(m.valueType))
      case _ => 0L
    }
    walk(schema)
  }

  /** Logical → physical schema (recursive rename; id mode also reads
    * physicalName, which the protocol requires to be present). */
  def toPhysicalSchema(schema: StructType, mappingMode: String): StructType =
    if (mappingMode == "none") schema
    else StructType(schema.fields.map(toPhysicalField))

  private def toPhysicalField(f: StructField): StructField =
    f.copy(name = physicalName(f), dataType = toPhysicalType(f.dataType))

  private def toPhysicalType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(toPhysicalField))
    case a: ArrayType => a.copy(elementType = toPhysicalType(a.elementType))
    case m: MapType => m.copy(keyType = toPhysicalType(m.keyType),
      valueType = toPhysicalType(m.valueType))
    case other => other
  }

  /** Column expression converting one physical top-level field back to
    * its logical shape (recursive struct rebuild for nested renames). */
  def toLogicalColumn(physical: StructField, logical: StructField): Column =
    rebuild(col(quote(physical.name)), physical.dataType, logical.dataType)
      .as(logical.name)

  /** The WRITE-side inverse of [[toLogicalColumn]]: one logical
    * top-level field rebuilt into its physical shape, nested struct
    * fields included. Every rename the read side undoes must be applied
    * here — a top-level-only rename would write nested fields with
    * logical names, which the recursive physical read schema then
    * resolves to null (silent data loss on externally-created tables
    * whose NESTED fields carry physical names). */
  def toPhysicalColumn(logical: StructField, physical: StructField): Column =
    rebuildPhys(col(quote(logical.name)), logical.dataType, physical.dataType)
      .as(physical.name)

  private def rebuildPhys(c: Column, logical: DataType,
      phys: DataType): Column = (logical, phys) match {
    case (l: StructType, p: StructType) =>
      val children = l.fields.zip(p.fields).map { case (lf, pf) =>
        rebuildPhys(c.getField(lf.name), lf.dataType, pf.dataType).as(pf.name)
      }
      when(c.isNull, lit(null).cast(phys))
        .otherwise(struct(children.toIndexedSeq: _*))
    case (ArrayType(le: StructType, cn), ArrayType(pe: StructType, _)) =>
      transform(c, e => rebuildPhys(e, le, pe)).cast(ArrayType(pe, cn))
    case (l, p) if l == p => c
    case (_, p) => c.cast(p)
  }

  /** Logical partition column name → the PHYSICAL name keying the log's
    * `partitionValues` and the hive directory layout (identity when the
    * table is unmapped — the protocol keys partition values by physical
    * name under column mapping). */
  def physicalPartitionName(meta: Metadata, logicalName: String): String =
    if (mode(meta) == "none") logicalName
    else meta.dataSchema.fields.find(_.name == logicalName)
      // case-insensitive fallback: older metadata may carry the
      // caller's casing rather than the schema's exact spelling
      .orElse(meta.dataSchema.fields.find(_.name.equalsIgnoreCase(logicalName)))
      .map(physicalName).getOrElse(logicalName)

  private def quote(name: String): String = s"`${name.replace("`", "``")}`"

  private def rebuild(c: Column, phys: DataType, logical: DataType): Column =
    (phys, logical) match {
      case (p: StructType, l: StructType) =>
        val children = l.fields.zip(p.fields).map { case (lf, pf) =>
          rebuild(c.getField(pf.name), pf.dataType, lf.dataType).as(lf.name)
        }
        // preserve null-ness of the struct itself
        when(c.isNull, lit(null).cast(logical))
          .otherwise(struct(children.toIndexedSeq: _*))
      case (ArrayType(pe: StructType, _), ArrayType(le: StructType, cn)) =>
        transform(c, e => rebuild(e, pe, le)).cast(ArrayType(le, cn))
      case (p, l) if p == l => c
      case (_, l) => c.cast(l)
    }
}
