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
    // A16/A18: VACUUM ... DRY RUN through the parser, on a fixture with
    // a deliberately-unreferenced file.
    Q.noOracle("vacuum_dry_run") { (s, dir) =>
      val path = DeltaQueries.versionedTable(s, dir) + "_vacuum"
      val g = GraftSession(s)
      this.synchronized {
        if (!new java.io.File(path, "_delta_log").exists()) {
          val o = s.read.parquet(s"$dir/orders.parquet")
          CommitWriter.createTable(s, o.repartition(2), path)
          val f = DeltaTable.forPath(s, path).allFiles
            .select("path").collect().head.getString(0)
          CommitWriter.commitRemoves(s, path, Seq(f))
        }
      }
      g.sql(s"VACUUM '$path' RETAIN 0 HOURS DRY RUN")
        .select("path", "length", "is_dir")
        .orderBy("path")
    },

    // A17: CREATE/DROP CATALOG through the parser
    Q.noOracle("create_catalog") { (s, _) =>
      val g = GraftSession(s)
      g.sql("DROP CATALOG IF EXISTS graft_demo CASCADE")
      val created = g.sql(
        "CREATE CATALOG graft_demo COMMENT 'demo' OPTIONS (owner graft)")
      g.sql("DROP CATALOG graft_demo")
      created
    },

    // table history via DESCRIBE HISTORY over a multi-commit fixture
    Q.noOracle("describe_history") { (s, dir) =>
      val path = DeltaQueries.versionedTable(s, dir)
      GraftSession(s).sql(s"DESCRIBE HISTORY '$path'")
        .select("version", "operation", "engine_info", "n_actions")
        .orderBy("version")
    },

    // A13: directory listing operator over the testdata dir
    Q.noOracle("dir_listing") { (s, dir) =>
      DirListing.list(s, dir)
        .select(col("path"), col("length"), col("is_dir"))
        .orderBy("path")
    },

    // A27: sign_storage_url local passthrough over file paths
    Q.noOracle("sign_url") { (s, dir) =>
      GraftSession.registerFunctions(s)
      DirListing.list(s, dir)
        .where(!col("is_dir"))
        .selectExpr("path", "sign_storage_url(path) AS signed")
        .orderBy("path")
    })
}
