package graft.delta.scan

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal => CatLit}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.graftshim.Shims.{Attr, Fn, Lit => PLit, PredNode}
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}
import graft.delta.Snapshot

/** Partition pruning THROUGH generated columns: a table partitioned on
  * `event_date GENERATED ALWAYS AS (CAST(ts AS DATE))` should prune
  * partitions for a predicate on `ts` — the time-partitioned-table
  * staple, where the user filters the raw timestamp and the layout key
  * is its derivative. Without the derivation a `ts` range scans every
  * partition at 100 TB.
  *
  * Soundness: only MONOTONE (non-decreasing) single-source generation
  * shapes transfer a range — `src ∈ [a, b]` implies
  * `g ∈ [f(a), f(b)]` for monotone f, so the derived predicate holds
  * for every row the original matches (files pruned by it cannot hold
  * a matching row). Supported shapes: `CAST(src AS DATE)`,
  * `DATE_TRUNC('unit', src)`, `YEAR(src)`. Non-monotone derivatives
  * (`MONTH(src)` wraps yearly) are never derived. Only TOP-LEVEL
  * conjuncts transfer — a bound inside OR/NOT holds on one branch
  * only. Rows with NULL src fail the source predicate anyway, so
  * pruning their (NULL-valued) partitions stays sound. f is evaluated
  * by the reading session; like delta-spark, timestamp-derived
  * generation expressions assume write/read sessions agree on the
  * session time zone (this project pins UTC everywhere).
  */
object GeneratedPartitionFilters {

  /** Derived partition predicates implied by `filters` — for pruning
    * only (they are consequences of the generation invariant, not new
    * user constraints). */
  def derive(snapshot: Snapshot, filters: Seq[Column]): Seq[Column] = {
    val partCols = snapshot.partitionColumns
    if (partCols.isEmpty || filters.isEmpty) return Seq.empty
    val spark = snapshot.spark

    val gens: Seq[(String, String, Expression, DataType)] =
      partCols.flatMap { p =>
        scala.util.Try {
          val f = snapshot.schema(p)
          if (!f.metadata.contains("delta.generationExpression")) None
          else {
            val sql = f.metadata.getString("delta.generationExpression")
            val parsed = spark.sessionState.sqlParser.parseExpression(sql)
            monotoneSource(parsed)
              // monotonicity must hold in the SOURCE's comparison
              // order, not just the date domain: CAST(string AS DATE)
              // is not monotone in string collation ('2026-2-1' sorts
              // AFTER '2026-10-01' yet casts to an earlier date), so
              // only temporal sources derive
              .filter(src => snapshot.schema.fields
                .find(_.name.equalsIgnoreCase(src))
                .exists(_.dataType match {
                  case TimestampType | TimestampNTZType | DateType => true
                  case _ => false
                }))
              .map(src => (p, src.toLowerCase, parsed, f.dataType))
          }
        }.toOption.flatten
      }
    if (gens.isEmpty) return Seq.empty

    val leaves = filters.flatMap(f => conjunctLeaves(Shims.predNode(f)))
    val wanted: Seq[(String, String, Expression, DataType, String, Any)] =
      gens.flatMap { case (p, src, parsed, dt) =>
        leaves.collect { case (name, op, v) if name.toLowerCase == src =>
          (p, src, parsed, dt, op, v)
        }
      }
    if (wanted.isEmpty) return Seq.empty
    // ONE local evaluation for every (generator, leaf) pair: the
    // substituted expressions select over a LocalRelation row, so the
    // planning cost is a single analyzed projection, no distributed job
    val values: Seq[Any] = evalAll(spark,
      wanted.map { case (_, src, parsed, dt, _, v) => (parsed, src, v, dt) })
    wanted.zip(values).flatMap {
      case ((p, _, _, _, op, _), g) if g != null =>
        Some(op match {
          // monotone, not strictly: strict source bounds still give
          // INCLUSIVE derived bounds (src > a can land in f(a))
          case ">" | ">=" => col(p) >= lit(g)
          case "<" | "<=" => col(p) <= lit(g)
          case "=" => col(p) === lit(g)
        })
      case _ => None
    }
  }

  /** The single source column of a monotone generation expression. */
  private def monotoneSource(parsed: Expression): Option[String] =
    parsed match {
      case c: Cast => (c.child, c.dataType) match {
        case (a: UnresolvedAttribute, DateType) => Some(a.name)
        case _ => None
      }
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("date_trunc") =>
        f.arguments match {
          case Seq(CatLit(_, _), a: UnresolvedAttribute) => Some(a.name)
          case _ => None
        }
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("year") =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute) => Some(a.name)
          case _ => None
        }
      case _ => None
    }

  /** Top-level conjunct comparison leaves as (column, op, literal) —
    * literal-on-the-left flipped into canonical order. */
  private def conjunctLeaves(n: PredNode): Seq[(String, String, Any)] =
    n match {
      case Fn("and", Seq(l, r)) => conjunctLeaves(l) ++ conjunctLeaves(r)
      case Fn(op @ ("=" | ">" | "<" | ">=" | "<="), Seq(Attr(a), PLit(v)))
          if v != null =>
        Seq((a, op, v))
      case Fn(op @ ("=" | ">" | "<" | ">=" | "<="), Seq(PLit(v), Attr(a)))
          if v != null =>
        Seq((a, StatsSkipping.flip(op), v))
      case _ => Seq.empty
    }

  /** f(v) for every (expression, source, literal, targetType) — each
    * cast to the partition column's type (exactly the write path's
    * `expr(sql).cast(dt)`). Evaluated in ONE projection over a local
    * one-row relation (driver-local collect, no distributed job).
    * Nulls (or a wholesale evaluation failure) yield no derivation —
    * none beats a wrong one. */
  private def evalAll(spark: SparkSession,
      items: Seq[(Expression, String, Any, DataType)]): Seq[Any] =
    scala.util.Try {
      import spark.implicits._
      val cols = items.zipWithIndex.map { case ((parsed, src, v, dt), i) =>
        val substituted = parsed.transformUp {
          case a: UnresolvedAttribute if a.name.equalsIgnoreCase(src) =>
            Shims.expression(lit(v))
        }
        Shims.column(substituted).cast(dt).as(s"g$i")
      }
      val row = Seq(1).toDF("one").select(cols: _*).head
      items.indices.map(i => row.get(i))
    }.getOrElse(items.map(_ => null))
}
