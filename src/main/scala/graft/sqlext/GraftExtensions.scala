package graft.sqlext

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType
import graft.catalog.LocalCatalog
import graft.commands.VacuumCommand
import graft.ops.DirListing
import graft.sqlext.GraftParser._

/** `SparkSessionExtensions` registration: injects the lakehouse parser
  * so plain `spark.sql("VACUUM …")` / `CREATE CATALOG …` work on any
  * session built with
  * `.config("spark.sql.extensions", "graft.sqlext.GraftExtensions")`.
  *
  * This is the Spark analogue of the reference's parser + extension
  * planner wiring (reference: crates/datafusion/src/sql/parser.rs:30-49
  * front-end interception; planner.rs:20-84 extension planning): our
  * statements become a `LeafRunnableCommand`, everything else falls
  * through to the delegate parser untouched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectParser((_, delegate) => new GraftParserInterface(delegate))
    // scalar extension functions (SQL-callable): vector_dot(a, b)
    extensions.injectFunction((
      FunctionIdentifier("vector_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.VectorDot].getCanonicalName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vector_dot expects 2 arguments, got ${children.length}")
        graft.functions.VectorDot(children.head, children(1))
      }))
    // table-valued function (ecosystem-standard CDF syntax):
    //   SELECT * FROM table_changes('/path', startV [, endV])
    // resolves to the same derived change feed as
    // spark.read.option("readChangeFeed", ...) — _change_type,
    // _commit_version, _commit_timestamp columns included.
    extensions.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        getClass.getCanonicalName, "table_changes"),
      GraftExtensions.tableChangesBuilder))
  }
}

object GraftExtensions {

  /** The `table_changes` TVF plan builder — shared by the
    * `SparkSessionExtensions` injection above and
    * [[registerTableChanges]] for sessions built without the
    * extension. */
  private[graft] val tableChangesBuilder: Seq[Expression] => LogicalPlan =
    (args: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.Literal
      def const(e: Expression, what: String): Any = e match {
        case Literal(v, _) if v != null => v match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => other
        }
        case _ => throw new IllegalArgumentException(
          s"table_changes: $what must be a non-null literal, got $e")
      }
      require(args.length == 2 || args.length == 3,
        "table_changes(path, startVersion [, endVersion]) expects " +
          s"2 or 3 arguments, got ${args.length}")
      val path = const(args.head, "path").toString
      def version(e: Expression, what: String): Long =
        const(e, what) match {
          case n: Number => n.longValue()
          case s: String if s.matches("-?\\d+") => s.toLong
          case other => throw new IllegalArgumentException(
            s"table_changes: $what must be a version number, got $other")
        }
      val spark = SparkSession.active
      var reader = spark.read.format("graftdelta")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", version(args(1), "startVersion"))
      if (args.length == 3)
        reader = reader.option("endingVersion",
          version(args(2), "endVersion"))
      reader.load().queryExecution.analyzed
    }

  /** Register the `table_changes` TVF into a LIVE session (the
    * injection path above only reaches sessions built with
    * `spark.sql.extensions`). Idempotent — re-registration replaces
    * the same builder. */
  def registerTableChanges(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        getClass.getCanonicalName, "table_changes"),
      tableChangesBuilder)
}

final class GraftParserInterface(delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    try GraftParser.parse(sqlText) match {
      // schema DDL on a NON-graft catalog delegates at execution time
      // through GraftSession.sql (re-rendered spark.sql, different
      // result shape); through the extension the output schema is fixed
      // at parse time, so the wrap decision must be made HERE
      case Some(s: CreateSchemaStatement)
          if LocalCatalog.get(s.catalog).isEmpty =>
        // re-render before delegating: our OPTIONS clause is not
        // vanilla Spark syntax (Spark spells it WITH DBPROPERTIES), and
        // the GraftSession.sql path already re-renders — the same
        // statement must behave identically through both entry points
        delegate.parsePlan(graft.GraftSession.renderVanillaCreateSchema(s))
      case Some(s: DropSchemaStatement)
          if LocalCatalog.get(s.catalog).isEmpty =>
        delegate.parsePlan(sqlText)
      case Some(ShowSchemasStatement(cat))
          if LocalCatalog.get(cat).isEmpty =>
        delegate.parsePlan(sqlText)
      case Some(stmt) => GraftCommand(stmt)
      case None => delegate.parsePlan(sqlText)
    } catch {
      case pe: GraftParser.ParseException =>
        // extension grammar first, Spark otherwise — but if the
        // delegate ALSO rejects the text, our (specific) diagnosis
        // rides along instead of vanishing behind the generic one
        try delegate.parsePlan(sqlText)
        catch {
          case e: Exception => e.addSuppressed(pe); throw e
        }
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Runnable command wrapping a parsed lakehouse statement (the UDLN +
  * extension-planner pair collapses to one node in Spark). */
final case class GraftCommand(stmt: Statement) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = {
    val schema: StructType = stmt match {
      case v: VacuumStatement =>
        if (v.dryRun) DirListing.schema else VacuumCommand.metricsSchema
      case _: CreateCatalogStatement => LocalCatalog.createSchema
      case _: DropCatalogStatement => LocalCatalog.dropSchema
      case _: OptimizeStatement => VacuumCommand.metricsSchema
      case _: DescribeHistoryStatement =>
        graft.commands.HistoryCommand.historySchema
      case _: RestoreStatement => VacuumCommand.metricsSchema
      case _: ConvertStatement => graft.commands.ConvertCommand.metricsSchema
      case _: CloneStatement => VacuumCommand.metricsSchema
      case _: DescribeDetailStatement =>
        graft.commands.HistoryCommand.detailSchema
      case _: RenameColumnStatement => VacuumCommand.metricsSchema
      case _: AddColumnStatement => VacuumCommand.metricsSchema
      case _: DropColumnStatement => VacuumCommand.metricsSchema
      case _: AddConstraintStatement => VacuumCommand.metricsSchema
      case _: DropConstraintStatement => VacuumCommand.metricsSchema
      case _: SetTblPropertiesStatement => VacuumCommand.metricsSchema
      case _: UnsetTblPropertiesStatement => VacuumCommand.metricsSchema
      case _: DeleteStatement => VacuumCommand.metricsSchema
      case _: UpdateStatement => VacuumCommand.metricsSchema
      case _: MergeStatement => VacuumCommand.metricsSchema
      case _: ReplaceWhereStatement => VacuumCommand.metricsSchema
      case f: FsckStatement =>
        if (f.dryRun) graft.commands.FsckCommand.dryRunSchema
        else VacuumCommand.metricsSchema
      case _: DropFeatureStatement => VacuumCommand.metricsSchema
      case _: CopyIntoStatement => VacuumCommand.metricsSchema
      case _: GenerateManifestStatement => VacuumCommand.metricsSchema
      case _: MergeDeleteStatement => VacuumCommand.metricsSchema
      case _: MergeSyncStatement => VacuumCommand.metricsSchema
      case _: CtasStatement => VacuumCommand.metricsSchema
      case _: ClusterByStatement => VacuumCommand.metricsSchema
      case _: AlterColumnTypeStatement => VacuumCommand.metricsSchema
      case _: AlterColumnDefaultStatement => VacuumCommand.metricsSchema
      case _: RestoreTimestampStatement => VacuumCommand.metricsSchema
      case ShowCatalogsStatement => graft.GraftSession.showCatalogsSchema
      case _: ShowTblPropertiesStatement =>
        graft.GraftSession.tblPropertiesSchema
      case _: ShowPartitionsStatement =>
        graft.GraftSession.showPartitionsSchema
      case _: AnalyzeTableStatement => VacuumCommand.metricsSchema
      case _: CreateSchemaStatement => LocalCatalog.createSchema
      case _: DropSchemaStatement => LocalCatalog.dropSchema
      case _: ShowSchemasStatement => graft.GraftSession.showSchemasSchema
      case _: CreateShareStatement => LocalCatalog.createSchema
      case _: DropShareStatement => LocalCatalog.dropSchema
      case ShowSharesStatement => graft.GraftSession.showSharesSchema
      case _: CreateLocationStatement => LocalCatalog.createSchema
      case _: DropLocationStatement => LocalCatalog.dropSchema
      case ShowLocationsStatement => graft.GraftSession.showLocationsSchema
      case _: CreateConnectionStatement => LocalCatalog.createSchema
      case _: DropConnectionStatement => LocalCatalog.dropSchema
      case ShowConnectionsStatement =>
        graft.GraftSession.showConnectionsSchema
      case _: CreateForeignCatalogStatement => LocalCatalog.createSchema
      case _: AlterShareAddStatement => LocalCatalog.createSchema
      case _: AlterShareRemoveStatement => LocalCatalog.dropSchema
      case _: ShowShareObjectsStatement =>
        graft.GraftSession.showShareObjectsSchema
    }
    DataTypeUtils.toAttributes(schema)
  }

  override def run(session: SparkSession): Seq[Row] =
    new graft.GraftSession(session).execute(stmt).collect().toSeq
}
