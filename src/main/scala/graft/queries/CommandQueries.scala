package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.delta.DeltaTable
import graft.delta.log.CommitWriter
import graft.ops.DirListing

/** Command-surface queries (SURVEY.md §2 A13-A18, A27): exercised through
  * the SQL front-end exactly as a user would drive them. Results are
  * command outputs (metrics/listings), so these are declared rows-only
  * (no DuckDB-expressible oracle over the source tables).
  */
object CommandQueries {

  val all: Seq[Q] = Seq(
    // A16/A18: VACUUM ... DRY RUN through the parser, on the
    // sf-independent log fixture (read-only: DRY RUN never mutates).
    // Oracle: DuckDB replays the log — vacuum candidates are exactly the
    // paths whose latest action is a remove, with lengths from their add
    // actions (add.size == on-disk length by construction).
    Q("vacuum_dry_run",
      s"""WITH acts AS (
         |  SELECT COALESCE("add"->>'$$.path', remove->>'$$.path') AS relpath,
         |         "add" IS NOT NULL AS is_add,
         |         CAST("add"->>'$$.size' AS BIGINT) AS add_size,
         |         CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS cv
         |  FROM ${DeltaQueries.logJsonSrc}
         |  WHERE "add" IS NOT NULL OR remove IS NOT NULL
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY relpath
         |    ORDER BY cv DESC, is_add DESC) AS rn FROM acts
         |), dead AS (
         |  SELECT relpath FROM ranked WHERE rn = 1 AND NOT is_add
         |), sizes AS (
         |  SELECT relpath, any_value(add_size) AS length
         |  FROM acts WHERE is_add GROUP BY relpath
         |)
         |SELECT 'file:${DeltaQueries.LogDemoPath}/' || d.relpath AS path,
         |       s.length AS length, false AS is_dir
         |FROM dead d JOIN sizes s USING (relpath) ORDER BY path""".stripMargin) { (s, dir) =>
      val path = DeltaQueries.logDemoTable(s, dir)
      GraftSession(s).sql(s"VACUUM '$path' RETAIN 0 HOURS DRY RUN")
        .select("path", "length", "is_dir")
        .orderBy("path")
    },

    // VACUUM LITE (implemented past the reference's todo!,
    // vacuum/mod.rs:130): candidates from the log's remove tombstones,
    // zero directory listings (pinned in CommandsSpec). With RETAIN 0
    // every tombstone qualifies, so the oracle is the same dead-path
    // replay as vacuum_dry_run — the two modes must agree exactly on a
    // debris-free table.
    Q("vacuum_lite",
      s"""WITH acts AS (
         |  SELECT COALESCE("add"->>'$$.path', remove->>'$$.path') AS relpath,
         |         "add" IS NOT NULL AS is_add,
         |         CAST("add"->>'$$.size' AS BIGINT) AS add_size,
         |         CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS cv
         |  FROM ${DeltaQueries.logJsonSrc}
         |  WHERE "add" IS NOT NULL OR remove IS NOT NULL
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY relpath
         |    ORDER BY cv DESC, is_add DESC) AS rn FROM acts
         |), dead AS (
         |  SELECT relpath FROM ranked WHERE rn = 1 AND NOT is_add
         |), sizes AS (
         |  SELECT relpath, any_value(add_size) AS length
         |  FROM acts WHERE is_add GROUP BY relpath
         |)
         |SELECT 'file:${DeltaQueries.LogDemoPath}/' || d.relpath AS path,
         |       s.length AS length, false AS is_dir
         |FROM dead d LEFT JOIN sizes s USING (relpath) ORDER BY path""".stripMargin) { (s, dir) =>
      val path = DeltaQueries.logDemoTable(s, dir)
      GraftSession(s).sql(s"VACUUM '$path' LITE RETAIN 0 HOURS DRY RUN")
        .select("path", "length", "is_dir")
        .orderBy("path")
    },

    // A17: CREATE/DROP CATALOG through the parser. Output is the
    // securable row the reference's catalog commands return; the VALUES
    // oracle pins that contract (name/type/serialized object).
    Q("create_catalog",
      """SELECT 'graft_demo' AS securable_name,
        |  'catalog' AS securable_type,
        |  '{"name":"graft_demo","comment":"demo","options":{"owner":"graft"}}'
        |    AS securable_object""".stripMargin) { (s, _) =>
      val g = GraftSession(s)
      g.sql("DROP CATALOG IF EXISTS graft_demo CASCADE")
      val created = g.sql(
        "CREATE CATALOG graft_demo COMMENT 'demo' OPTIONS (owner graft)")
      g.sql("DROP CATALOG graft_demo")
      created
    },

    // CREATE SCHEMA under a local catalog (the reference's own todo! at
    // sql/parser.rs:355, implemented against the same securable model
    // its CREATE CATALOG returns — securable row contract from
    // sql/unity/mod.rs:24-31). The full lifecycle (duplicates, CASCADE,
    // SHOW SCHEMAS, namespace integration) is pinned in CommandsSpec.
    Q("create_schema",
      """SELECT 'graft_demo.ml' AS securable_name,
        |  'schema' AS securable_type,
        |  '{"name":"ml","catalog_name":"graft_demo","comment":"training data"}'
        |    AS securable_object""".stripMargin) { (s, _) =>
      val g = GraftSession(s)
      g.sql("DROP CATALOG IF EXISTS graft_demo CASCADE")
      g.sql("CREATE CATALOG graft_demo")
      val created = g.sql(
        "CREATE SCHEMA graft_demo.ml COMMENT 'training data'")
      g.sql("DROP SCHEMA graft_demo.ml")
      g.sql("DROP CATALOG graft_demo")
      created
    },

    // SHOW SCHEMAS listing contract (name, parent catalog, comment),
    // sorted by name like SHOW CATALOGS
    Q("q_show_schemas",
      """SELECT * FROM (VALUES
        |  ('curated', 'graft_demo', NULL),
        |  ('raw', 'graft_demo', 'landing zone'))
        |  AS t(schema_name, catalog_name, comment)
        |ORDER BY schema_name""".stripMargin) { (s, _) =>
      val g = GraftSession(s)
      g.sql("DROP CATALOG IF EXISTS graft_demo CASCADE")
      g.sql("CREATE CATALOG graft_demo")
      g.sql("CREATE SCHEMA graft_demo.raw COMMENT 'landing zone'")
      g.sql("CREATE SCHEMA graft_demo.curated")
      val listed = g.sql("SHOW SCHEMAS IN graft_demo")
      g.sql("DROP CATALOG graft_demo CASCADE")
      listed
    },

    // table history via DESCRIBE HISTORY over the sf-independent log
    // fixture. Oracle: DuckDB derives the same rows from the raw
    // _delta_log JSON (commitInfo fields + non-commitInfo line counts).
    Q("describe_history",
      s"""SELECT
         |  CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS version,
         |  any_value(commitInfo->>'$$.operation') AS operation,
         |  any_value(commitInfo->>'$$.engineInfo') AS engine_info,
         |  count(*) - count(commitInfo->>'$$.operation') AS n_actions
         |FROM ${DeltaQueries.logJsonSrc}
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path = DeltaQueries.logDemoTable(s, dir)
      GraftSession(s).sql(s"DESCRIBE HISTORY '$path'")
        .select("version", "operation", "engine_info", "n_actions")
        .orderBy("version")
    },

    // A13: directory listing operator over the sf-independent fixture.
    // Oracle: the top level of a partitioned Delta table is fully
    // determined by the log — one dir per distinct partition value plus
    // _delta_log (no top-level files; dirs list null length).
    Q("dir_listing",
      s"""SELECT 'file:${DeltaQueries.LogDemoPath}/' || d AS path,
         |       CAST(NULL AS BIGINT) AS length, true AS is_dir
         |FROM (
         |  SELECT DISTINCT 'n_regionkey=' ||
         |    ("add"->'$$.partitionValues'->>'$$.n_regionkey') AS d
         |  FROM ${DeltaQueries.logJsonSrc}
         |  WHERE "add" IS NOT NULL
         |  UNION ALL SELECT '_delta_log'
         |) t ORDER BY path""".stripMargin) { (s, dir) =>
      DirListing.list(s, DeltaQueries.logDemoTable(s, dir))
        .select(col("path"), col("length"), col("is_dir"))
        .orderBy("path")
    },

    // A27: sign_storage_url local passthrough over the fixture's commit
    // files. Oracle: the same file set via read_json's filename column;
    // local URLs sign to themselves (the reference's LocalFileSystem arm).
    Q("sign_url",
      s"""SELECT DISTINCT 'file:' || filename AS path,
         |       'file:' || filename AS signed
         |FROM ${DeltaQueries.logJsonSrc}
         |ORDER BY path""".stripMargin) { (s, dir) =>
      GraftSession.registerFunctions(s)
      DirListing.list(s, DeltaQueries.logDemoTable(s, dir) + "/_delta_log")
        .where(!col("is_dir"))
        .selectExpr("path", "sign_storage_url(path) AS signed")
        .orderBy("path")
    })
}
