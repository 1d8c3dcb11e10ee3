package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.LocalCatalog
import graft.delta.DeltaTable
import graft.delta.log.CommitWriter
import graft.sqlext.GraftParser
import graft.sqlext.GraftParser._

class CommandsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(name: String): String = {
    val d = Files.createTempDirectory(s"graft_cmd_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val region = spark.read.parquet(s"$sf/region.parquet")

  // ---- parser (forms from reference sql/parser.rs:493-658 tests) ----

  test("expression reassembly keeps dots attached (decimals, qualified names)") {
    // the tokenizer splits on '.'; sqlOf must re-join decimal literals
    // and qualified names or downstream Spark parsing breaks
    assert(GraftParser.parse("DELETE FROM t WHERE price > 999.5") ==
      Some(DeleteStatement("t", Some("price > 999.5"))))
    assert(GraftParser.parse("UPDATE t SET a = 0.25 WHERE b < 1.5") ==
      Some(UpdateStatement("t", Seq("a" -> "0.25"), Some("b < 1.5"))))
    assert(GraftParser.parse(
      "ALTER TABLE t ADD CONSTRAINT c CHECK ( price >= 0.01 )") ==
      Some(AddConstraintStatement("t", "c", "price >= 0.01")))
    assert(GraftParser.parse(
      "ALTER TABLE t ALTER COLUMN price SET DEFAULT 999.5") ==
      Some(AlterColumnDefaultStatement("t", "price", Some("999.5"))))
  }

  test("SHOW TBLPROPERTIES lists configuration sorted") {
    val d = java.nio.file.Files.createTempDirectory("graft_stp").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    graft.delta.log.CommitWriter.createTable(spark,
      spark.read.parquet(s"${TestSpark.sf}/region.parquet").limit(1), p,
      configuration = Map("team" -> "ml", "delta.appendOnly" -> "false"))
    val g = new graft.GraftSession(spark)
    val rows = g.sql(s"SHOW TBLPROPERTIES '$p'").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq("delta.appendOnly" -> "false", "team" -> "ml"))
  }

  test("parse VACUUM forms") {
    assert(GraftParser.parse("VACUUM my_table") ==
      Some(VacuumStatement("my_table", None, dryRun = false, None)))
    assert(GraftParser.parse("VACUUM my_table RETAIN 24 HOURS") ==
      Some(VacuumStatement("my_table", None, dryRun = false, Some(24.0))))
    assert(GraftParser.parse("VACUUM my_table FULL DRY RUN RETAIN 48 HOURS") ==
      Some(VacuumStatement("my_table", Some("FULL"), dryRun = true, Some(48.0))))
    assert(GraftParser.parse("VACUUM delta.'s3://bucket/path'") ==
      Some(VacuumStatement("s3://bucket/path", None, dryRun = false, None)))
    assert(GraftParser.parse("VACUUM '/tmp/t' DRY RUN") ==
      Some(VacuumStatement("/tmp/t", None, dryRun = true, None)))
  }

  test("parse CREATE CATALOG forms") {
    assert(GraftParser.parse("CREATE CATALOG my_catalog") ==
      Some(CreateCatalogStatement("my_catalog", ifNotExists = false,
        None, None, None, None, Map.empty)))
    assert(GraftParser.parse("CREATE CATALOG IF NOT EXISTS my_catalog") ==
      Some(CreateCatalogStatement("my_catalog", ifNotExists = true,
        None, None, None, None, Map.empty)))
    assert(GraftParser.parse("CREATE CATALOG c USING SHARE provider.share") ==
      Some(CreateCatalogStatement("c", ifNotExists = false,
        Some("provider.share"), None, None, None, Map.empty)))
    assert(GraftParser.parse(
      "CREATE CATALOG c MANAGED LOCATION 's3://b/c' COMMENT 'hi' OPTIONS (k1 v1, k2 'v 2')") ==
      Some(CreateCatalogStatement("c", ifNotExists = false, None,
        Some("s3://b/c"), Some("hi"), None, Map("k1" -> "v1", "k2" -> "v 2"))))
    intercept[ParseException] {
      GraftParser.parse("CREATE CATALOG c USING SHARE p.s MANAGED LOCATION 'x'")
    }
  }

  test("parse DROP CATALOG forms") {
    assert(GraftParser.parse("DROP CATALOG c") ==
      Some(DropCatalogStatement("c", ifExists = false, cascade = false)))
    assert(GraftParser.parse("DROP CATALOG IF EXISTS c CASCADE") ==
      Some(DropCatalogStatement("c", ifExists = true, cascade = true)))
  }

  test("malformed securable DDL gets our diagnosis; plain SQL delegates") {
    // every securable the reference's grammar names is now implemented;
    // malformed shapes fail with OUR diagnosis, not a silent delegate
    intercept[GraftParser.ParseException] {
      GraftParser.parse("CREATE CONNECTION c") // missing TYPE
    }
    intercept[GraftParser.ParseException] {
      GraftParser.parse("CREATE FOREIGN CATALOG fc") // missing USING
    }
    assert(GraftParser.parse("SELECT 1").isEmpty)
    assert(GraftParser.parse("CREATE TABLE t (a INT)").isEmpty)
    // unqualified schema DDL is vanilla Spark, not ours
    assert(GraftParser.parse("CREATE SCHEMA foo").isEmpty)
    assert(GraftParser.parse("DROP SCHEMA foo").isEmpty)
  }

  test("parse CREATE/DROP/SHOW SCHEMA forms") {
    assert(GraftParser.parse("CREATE SCHEMA cat.ml") ==
      Some(CreateSchemaStatement("cat", "ml", ifNotExists = false,
        None, Map.empty)))
    assert(GraftParser.parse(
      "CREATE SCHEMA IF NOT EXISTS cat.ml COMMENT 'training' " +
        "OPTIONS (owner graft)") ==
      Some(CreateSchemaStatement("cat", "ml", ifNotExists = true,
        Some("training"), Map("owner" -> "graft"))))
    assert(GraftParser.parse("DROP SCHEMA cat.ml CASCADE") ==
      Some(DropSchemaStatement("cat", "ml", ifExists = false,
        cascade = true)))
    assert(GraftParser.parse("DROP SCHEMA IF EXISTS cat.ml") ==
      Some(DropSchemaStatement("cat", "ml", ifExists = true,
        cascade = false)))
    assert(GraftParser.parse("SHOW SCHEMAS IN cat") ==
      Some(ShowSchemasStatement("cat")))
    // unqualified SHOW SCHEMAS stays vanilla
    assert(GraftParser.parse("SHOW SCHEMAS").isEmpty)
  }

  test("schema DDL delegation: vanilla Spark shapes are never intercepted") {
    // LIKE patterns, multi-part namespaces, unqualified forms — valid
    // Spark SQL that must keep delegating (parse → None), not throw
    assert(GraftParser.parse("SHOW SCHEMAS IN spark_catalog LIKE 'p*'").isEmpty)
    assert(GraftParser.parse("SHOW NAMESPACES FROM cat.ns").isEmpty)
    assert(GraftParser.parse("SHOW SCHEMAS LIKE 'x'").isEmpty)
    assert(GraftParser.parse("CREATE SCHEMA a.b.c").isEmpty)
    assert(GraftParser.parse("DROP SCHEMA a.b.c CASCADE").isEmpty)
    // the exact single-catalog form IS ours
    assert(GraftParser.parse("SHOW SCHEMAS IN cat") ==
      Some(ShowSchemasStatement("cat")))
  }

  test("same-named schemas in different catalogs do not interfere") {
    import graft.catalog.GraftCatalog
    val g = GraftSession(spark)
    g.sql("DROP CATALOG IF EXISTS isoa CASCADE")
    g.sql("DROP CATALOG IF EXISTS isob CASCADE")
    g.sql("CREATE CATALOG isoa")
    g.sql("CREATE CATALOG isob")
    g.sql("CREATE SCHEMA isoa.shared")
    g.sql("CREATE SCHEMA isob.shared")
    val path = tmpTable("iso_tbl")
    CommitWriter.createTable(spark, region, path)
    GraftCatalog.register("shared", "iso_t", path)
    try {
      // dropping one catalog's securable must not unregister the other
      // catalog's namespace or its tables
      g.sql("DROP SCHEMA isoa.shared")
      assert(GraftCatalog.lookupPath(Seq("shared", "iso_t")).contains(path),
        "surviving catalog's table was unregistered")
      // the LAST user of the name enforces emptiness again
      intercept[IllegalStateException] {
        g.sql("DROP SCHEMA isob.shared")
      }
      g.sql("DROP SCHEMA isob.shared CASCADE")
      assert(GraftCatalog.lookupPath(Seq("shared", "iso_t")).isEmpty)
    } finally {
      GraftCatalog.unregister("shared", "iso_t")
      g.sql("DROP CATALOG IF EXISTS isoa CASCADE")
      g.sql("DROP CATALOG IF EXISTS isob CASCADE")
    }
  }

  test("CREATE CATALOG binds the securable as a Spark catalog for vanilla SQL") {
    import graft.catalog.GraftCatalog
    val g = GraftSession(spark)
    g.sql("DROP CATALOG IF EXISTS vanilla_cat CASCADE")
    try {
      g.sql("CREATE CATALOG vanilla_cat")
      g.sql("CREATE SCHEMA vanilla_cat.ml")
      val path = tmpTable("van_tbl")
      CommitWriter.createTable(spark, region, path)
      GraftCatalog.register("ml", "vregion", path)
      // plain spark.sql — no GraftSession routing, no manual conf
      assert(spark.sql("SELECT count(*) AS n FROM vanilla_cat.ml.vregion")
        .head.getLong(0) == region.count())
      assert(spark.sql("SHOW TABLES IN vanilla_cat.ml").collect()
        .map(_.getString(1)).contains("vregion"))
    } finally {
      GraftCatalog.unregister("ml", "vregion")
      g.sql("DROP CATALOG IF EXISTS vanilla_cat CASCADE")
    }
    // the session binding is released with the securable, and the
    // dropped name no longer resolves as a Spark catalog
    assert(spark.conf.getOption("spark.sql.catalog.vanilla_cat").isEmpty)
    intercept[Exception] {
      spark.sql("SHOW NAMESPACES IN vanilla_cat").collect()
    }
    // a reserved name can never become a securable alias
    intercept[IllegalArgumentException] {
      GraftSession(spark).sql("CREATE CATALOG spark_catalog")
    }
    // a USER-configured binding of the same name survives the
    // securable's lifecycle (create skips binding, drop never unsets)
    spark.conf.set("spark.sql.catalog.user_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    try {
      g.sql("CREATE CATALOG user_cat")
      g.sql("DROP CATALOG user_cat")
      assert(spark.conf.getOption("spark.sql.catalog.user_cat")
        .contains(classOf[graft.catalog.GraftCatalog].getName),
        "DROP CATALOG unset a binding it never created")
    } finally spark.conf.unset("spark.sql.catalog.user_cat")
  }

  test("schema lifecycle through GraftSession.sql") {
    val g = GraftSession(spark)
    g.sql("DROP CATALOG IF EXISTS schcat CASCADE")
    g.sql("CREATE CATALOG schcat")
    val created = g.sql("CREATE SCHEMA schcat.ml COMMENT 'training'")
      .collect().head
    assert(created.getString(0) == "schcat.ml")
    assert(created.getString(1) == "schema")
    assert(created.getString(2).contains("\"catalog_name\":\"schcat\""))
    // duplicate refused; IF NOT EXISTS tolerated
    intercept[IllegalArgumentException] {
      g.sql("CREATE SCHEMA schcat.ml")
    }
    g.sql("CREATE SCHEMA IF NOT EXISTS schcat.ml")
    g.sql("CREATE SCHEMA schcat.raw")
    val listed = g.sql("SHOW SCHEMAS IN schcat").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(listed.toSeq == Seq("ml" -> "schcat", "raw" -> "schcat"))

    // the namespace is live in the DSv2 registry: a table registered
    // under it resolves catalog-qualified, and blocks a bare DROP
    val path = tmpTable("sch_tbl")
    CommitWriter.createTable(spark, region, path)
    graft.catalog.GraftCatalog.register("ml", "region_t", path)
    assert(g.sql(s"DESCRIBE DETAIL schcat.ml.region_t")
      .collect().head.getAs[String]("location") == path)
    intercept[IllegalStateException] {
      g.sql("DROP SCHEMA schcat.ml")
    }
    val dropped = g.sql("DROP SCHEMA schcat.ml CASCADE").collect().head
    assert(dropped.getString(2) == "DROPPED")
    assert(g.sql("SHOW SCHEMAS IN schcat").collect().map(_.getString(0))
      .toSeq == Seq("raw"))
    // dropping a missing schema: typed error without IF EXISTS
    intercept[IllegalArgumentException] {
      g.sql("DROP SCHEMA schcat.ml")
    }
    assert(g.sql("DROP SCHEMA IF EXISTS schcat.ml").collect()
      .head.getString(2) == "NOT_FOUND")
    // a non-empty catalog refuses a bare drop; CASCADE clears schemas
    intercept[IllegalArgumentException] {
      g.sql("DROP CATALOG schcat")
    }
    g.sql("DROP CATALOG schcat CASCADE")
  }

  // ---- commands end-to-end ------------------------------------------

  test("catalog lifecycle through GraftSession.sql") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val created = g.sql("CREATE CATALOG cat1 COMMENT 'test catalog'")
    val row = created.collect().head
    assert(row.getString(0) == "cat1")
    assert(row.getString(1) == "catalog")
    assert(row.getString(2).contains("test catalog"))
    // duplicate fails without IF NOT EXISTS
    intercept[IllegalArgumentException] { g.sql("CREATE CATALOG cat1") }
    // idempotent with IF NOT EXISTS
    g.sql("CREATE CATALOG IF NOT EXISTS cat1")
    val dropped = g.sql("DROP CATALOG cat1").collect().head
    assert(dropped.getString(2) == "DROPPED")
    intercept[IllegalArgumentException] { g.sql("DROP CATALOG cat1") }
    assert(g.sql("DROP CATALOG IF EXISTS cat1").collect()
      .head.getString(2) == "NOT_FOUND")
  }

  test("share lifecycle: create/list/drop, reference protection, CASCADE release") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val created = g.sql("CREATE SHARE s1 COMMENT 'quarterly'")
    val row = created.collect().head
    assert(row.getString(0) == "s1" && row.getString(1) == "share")
    assert(row.getString(2).contains("quarterly"))
    intercept[IllegalArgumentException] { g.sql("CREATE SHARE s1") }
    g.sql("CREATE SHARE IF NOT EXISTS s1") // idempotent
    g.sql("CREATE SHARE s2")
    val listed = g.sql("SHOW SHARES").collect().map(_.getString(0)).toSeq
    assert(listed == Seq("s1", "s2"))
    // a catalog created USING SHARE pins the share: DROP SHARE refuses
    // for both the bare and the provider-qualified reference form
    g.sql("CREATE CATALOG shared_cat USING SHARE prov.s1")
    intercept[IllegalArgumentException] { g.sql("DROP SHARE s1") }
    // dropping the catalog (CASCADE irrelevant here — no schemas)
    // releases the reference and the share drops cleanly
    g.sql("DROP CATALOG shared_cat")
    assert(g.sql("DROP SHARE s1").collect().head.getString(2) == "DROPPED")
    assert(g.sql("DROP SHARE s2").collect().head.getString(2) == "DROPPED")
    intercept[IllegalArgumentException] { g.sql("DROP SHARE s1") }
    assert(g.sql("DROP SHARE IF EXISTS s1").collect()
      .head.getString(2) == "NOT_FOUND")
  }

  test("shared tables serve reads through a consuming catalog") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val p = graft.queries.DeltaQueries.logDemoTable(spark, sf)
    g.sql("CREATE SHARE prov_share")
    g.sql(s"ALTER SHARE prov_share ADD TABLE '$p' AS shared_sales.orders")
    // the consumer mounts the share as a catalog; the shared name
    // resolves through the DSv2 plugin and serves REAL reads
    g.sql("CREATE CATALOG consumer USING SHARE provider.prov_share")
    val viaCatalog = spark
      .sql("SELECT count(*) FROM consumer.shared_sales.orders")
      .head.getLong(0)
    val direct = graft.delta.DeltaTable.forPath(spark, p).read.count()
    assert(direct > 0 && viaCatalog == direct,
      s"shared read $viaCatalog != direct $direct")
    // SHOW ALL IN SHARE lists the object; REMOVE retracts resolution
    assert(g.sql("SHOW ALL IN SHARE prov_share").collect()
      .map(_.getString(0)).toSeq == Seq("shared_sales.orders"))
    g.sql("ALTER SHARE prov_share REMOVE TABLE shared_sales.orders")
    intercept[Exception] {
      spark.sql("SELECT * FROM consumer.shared_sales.orders").collect()
    }
    g.sql("DROP CATALOG consumer")
    g.sql("DROP SHARE prov_share")
  }

  test("share publications are refcounted, case-normalized, never redirect") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val p = graft.queries.DeltaQueries.logDemoTable(spark, sf)
    g.sql("CREATE SHARE sa"); g.sql("CREATE SHARE sb")
    // case-insensitive object identity (the registry lowercases)
    g.sql(s"ALTER SHARE sa ADD TABLE '$p' AS Mixed.Case")
    g.sql("ALTER SHARE sa REMOVE TABLE mixed.case") // normalized spelling
    // two shares publish the same (name, path): the survivor keeps
    // resolving after the first retracts
    g.sql(s"ALTER SHARE sa ADD TABLE '$p' AS both.orders")
    g.sql(s"ALTER SHARE sb ADD TABLE '$p' AS both.orders")
    g.sql("CREATE CATALOG cons USING SHARE prov.sb")
    g.sql("ALTER SHARE sa REMOVE TABLE both.orders")
    assert(spark.sql("SELECT count(*) FROM cons.both.orders")
      .head.getLong(0) > 0, "share B's publication must survive A's removal")
    // a shared name must not redirect an existing registration
    intercept[IllegalArgumentException] {
      g.sql("ALTER SHARE sb ADD TABLE '/elsewhere/tbl' AS both.orders")
    }
    g.sql("ALTER SHARE sb REMOVE TABLE both.orders")
    intercept[Exception] {
      spark.sql("SELECT * FROM cons.both.orders").collect()
    }
    // a pre-existing (adopted) registration survives share teardown
    graft.catalog.GraftCatalog.register("pre", "kept", p)
    g.sql(s"ALTER SHARE sa ADD TABLE '$p' AS pre.kept")
    g.sql("ALTER SHARE sa REMOVE TABLE pre.kept")
    assert(graft.catalog.GraftCatalog.lookupPath(Seq("pre", "kept"))
      .contains(p), "adopted registration must survive the share's removal")
    g.sql("DROP CATALOG cons")
    g.sql("DROP SHARE sa"); g.sql("DROP SHARE sb")
    graft.catalog.GraftCatalog.unregister("pre", "kept")
  }

  test("duplicate ADD of the same shared name to one share is refused " +
    "(no refcount leak after the single REMOVE)") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val p = graft.queries.DeltaQueries.logDemoTable(spark, sf)
    g.sql("CREATE SHARE dup")
    g.sql(s"ALTER SHARE dup ADD TABLE '$p' AS d.t")
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER SHARE dup ADD TABLE '$p' AS d.t")
    }
    // the single REMOVE fully retracts (a silently-double-counted ADD
    // would leave the refcount at 1 forever and wedge the name): the
    // registration clears and a later ADD with a DIFFERENT path works
    g.sql("ALTER SHARE dup REMOVE TABLE d.t")
    assert(graft.catalog.GraftCatalog.lookupPath(Seq("d", "t")).isEmpty,
      "registration leaked after the single REMOVE")
    g.sql("ALTER SHARE dup ADD TABLE '/elsewhere/tbl' AS d.t")
    g.sql("ALTER SHARE dup REMOVE TABLE d.t")
    g.sql("DROP SHARE dup")
  }

  test("a dotted (backticked) schema name retracts cleanly on DROP SHARE") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val p = graft.queries.DeltaQueries.logDemoTable(spark, sf)
    g.sql("CREATE SHARE dotted")
    g.sql(s"ALTER SHARE dotted ADD TABLE '$p' AS `sch.ema`.tbl")
    assert(graft.catalog.GraftCatalog.lookupPath(Seq("sch.ema", "tbl"))
      .contains(p))
    // objects are keyed by the (schema, table) TUPLE: dropping the share
    // must retract the dotted name, not split it at the wrong boundary
    g.sql("DROP SHARE dotted")
    assert(graft.catalog.GraftCatalog.lookupPath(Seq("sch.ema", "tbl"))
      .isEmpty, "dotted-schema publication leaked after DROP SHARE")
  }

  test("external location lifecycle: both spellings, credential, options") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val created = g.sql(
      "CREATE EXTERNAL LOCATION raw URL 'file:///tmp/l/raw' " +
        "WITH (STORAGE CREDENTIAL cred1) COMMENT 'landing' " +
        "OPTIONS (read_only true)")
    val row = created.collect().head
    assert(row.getString(0) == "raw" &&
      row.getString(1) == "external_location")
    assert(row.getString(2).contains("file:///tmp/l/raw") &&
      row.getString(2).contains("cred1") &&
      row.getString(2).contains("read_only"))
    // the reference's bare spelling parses to the same statement
    g.sql("CREATE LOCATION curated URL 'file:///tmp/l/curated'")
    intercept[IllegalArgumentException] {
      g.sql("CREATE LOCATION raw URL 'file:///tmp/elsewhere'")
    }
    g.sql("CREATE EXTERNAL LOCATION IF NOT EXISTS raw URL 'file:///x'")
    val listed = g.sql("SHOW EXTERNAL LOCATIONS").collect()
    assert(listed.map(_.getString(0)).toSeq == Seq("curated", "raw"))
    assert(listed.find(_.getString(0) == "raw")
      .exists(r => r.getString(1) == "file:///tmp/l/raw" &&
        r.getString(2) == "cred1"))
    assert(g.sql("DROP LOCATION curated").collect()
      .head.getString(2) == "DROPPED")
    assert(g.sql("DROP EXTERNAL LOCATION raw").collect()
      .head.getString(2) == "DROPPED")
    intercept[IllegalArgumentException] { g.sql("DROP LOCATION raw") }
    assert(g.sql("DROP EXTERNAL LOCATION IF EXISTS raw").collect()
      .head.getString(2) == "NOT_FOUND")
  }

  test("share/location grammar never intercepts vanilla Spark shapes") {
    // CREATE EXTERNAL TABLE is plain Spark DDL — must delegate
    assert(GraftParser.parse(
      "CREATE EXTERNAL TABLE t (a INT) LOCATION '/tmp/x'").isEmpty)
    // SHOW SHARES with trailing clauses is not the exact form we claim
    assert(GraftParser.parse("SHOW SHARES LIKE 'x'").isEmpty)
    assert(GraftParser.parse("SHOW EXTERNAL LOCATIONS LIKE 'x'").isEmpty)
    assert(GraftParser.parse("SHOW CONNECTIONS LIKE 'x'").isEmpty)
  }

  test("connection + foreign catalog lifecycle and referential integrity") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val created = g.sql(
      "CREATE CONNECTION pg TYPE postgresql URL 'jdbc:postgresql://h/d'")
    val row = created.collect().head
    assert(row.getString(0) == "pg" && row.getString(1) == "connection")
    assert(row.getString(2).contains("postgresql"))
    intercept[IllegalArgumentException] {
      g.sql("CREATE CONNECTION pg TYPE mysql")
    }
    g.sql("CREATE CONNECTION IF NOT EXISTS pg TYPE mysql") // no-op
    // foreign catalog requires its connection to exist
    intercept[IllegalArgumentException] {
      g.sql("CREATE FOREIGN CATALOG fc USING CONNECTION missing")
    }
    val fc = g.sql("CREATE FOREIGN CATALOG fc USING CONNECTION pg")
      .collect().head
    assert(fc.getString(1) == "catalog" &&
      fc.getString(2).contains("using_connection"))
    // the mounted connection cannot drop while referenced
    intercept[IllegalArgumentException] { g.sql("DROP CONNECTION pg") }
    // DROP FOREIGN CATALOG parses as plain DROP CATALOG and releases it
    assert(g.sql("DROP FOREIGN CATALOG fc").collect()
      .head.getString(2) == "DROPPED")
    assert(g.sql("DROP CONNECTION pg").collect()
      .head.getString(2) == "DROPPED")
    assert(g.sql("DROP CONNECTION IF EXISTS pg").collect()
      .head.getString(2) == "NOT_FOUND")
    assert(g.sql("SHOW CONNECTIONS").collect().isEmpty)
  }

  test("foreign catalogs never gain a local DSv2 binding; re-runs are idempotent") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    g.sql("CREATE CONNECTION pg TYPE postgresql")
    g.sql("CREATE FOREIGN CATALOG fcat USING CONNECTION pg")
    assert(spark.conf.getOption("spark.sql.catalog.fcat").isEmpty,
      "foreign catalog must not alias the local plugin registry")
    // CREATE CATALOG IF NOT EXISTS over the existing FOREIGN catalog is
    // a no-op and must not bind the name either
    g.sql("CREATE CATALOG IF NOT EXISTS fcat")
    assert(spark.conf.getOption("spark.sql.catalog.fcat").isEmpty,
      "IF NOT EXISTS over a foreign catalog must not bind the plugin")
    // idempotent foreign re-run survives the connection being gone
    g.sql("DROP CATALOG fcat")
    g.sql("CREATE FOREIGN CATALOG fcat USING CONNECTION pg")
    intercept[IllegalArgumentException] { g.sql("DROP CONNECTION pg") }
    assert(g.sql(
      "CREATE FOREIGN CATALOG IF NOT EXISTS fcat USING CONNECTION nope")
      .collect().head.getString(0) == "fcat")
    // case-sensitive reference scan: 'PG' is a DIFFERENT securable and
    // drops freely while 'pg' stays protected
    g.sql("CREATE CONNECTION PG TYPE mysql")
    assert(g.sql("DROP CONNECTION PG").collect()
      .head.getString(2) == "DROPPED")
    g.sql("DROP CATALOG fcat")
    g.sql("DROP CONNECTION pg")
  }

  test("foreign catalog data plane: a file-URL connection mounts real " +
    "reads; read-only; DROP CONNECTION refuses while mounted") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val root = graft.queries.DeltaQueries.foreignSystemRoot(spark, sf)
    g.sql(s"CREATE CONNECTION fs_conn TYPE filesystem URL 'file://$root'")
    g.sql("CREATE FOREIGN CATALOG mounted USING CONNECTION fs_conn")
    // the local-tree data plane binds the READ-ONLY foreign plugin
    // (never the local registry plugin)
    assert(spark.conf.getOption("spark.sql.catalog.mounted")
      .contains(classOf[graft.catalog.ForeignCatalog].getName))
    val viaMount = spark
      .sql("SELECT count(*) FROM mounted.analytics.nations_live")
      .head.getLong(0)
    val direct = graft.delta.DeltaTable
      .forPath(spark, s"$root/analytics/nations_live").read.count()
    assert(direct > 0 && viaMount == direct,
      s"mounted read $viaMount != direct $direct")
    // SHOW TABLES walks the mounted layout
    assert(spark.sql("SHOW TABLES IN mounted.analytics").collect()
      .map(_.getString(1)).toSeq == Seq("nations_live"))
    // the foreign system owns its tables: DDL through the mount refuses
    intercept[Exception] {
      spark.sql("DROP TABLE mounted.analytics.nations_live")
    }
    assert(graft.delta.DeltaTable
      .forPath(spark, s"$root/analytics/nations_live").read.count() == direct)
    // referential integrity: the connection cannot drop while mounted
    intercept[IllegalArgumentException] { g.sql("DROP CONNECTION fs_conn") }
    // DROP CATALOG releases the binding; the connection then drops
    g.sql("DROP CATALOG mounted")
    assert(spark.conf.getOption("spark.sql.catalog.mounted").isEmpty)
    assert(spark.conf.getOption("spark.sql.catalog.mounted.root").isEmpty)
    g.sql("DROP CONNECTION fs_conn")
  }

  test("foreign catalog refresh parity: a post-mount append to the " +
    "backing table is visible through the mounted name") {
    // the reference's schema provider re-resolves the snapshot VERSION
    // on every lookup (schema_provider.rs:83-118) — the mount must not
    // freeze the table at mount-time state. ForeignCatalog.loadTable
    // builds a fresh table handle per resolution, so the foreign side
    // may grow between queries with zero refresh calls; this pins it.
    val g = GraftSession(spark)
    LocalCatalog.clear()
    // PRIVATE root (not foreignSystemRoot): the append must not mutate
    // the shared fixture other tests and q_foreign_read replay
    val root = tmpTable("foreign_refresh_root")
    val tbl = s"$root/live/growing"
    CommitWriter.createTable(spark, region.limit(3), tbl)
    g.sql(s"CREATE CONNECTION fr_conn TYPE filesystem URL 'file://$root'")
    g.sql("CREATE FOREIGN CATALOG fmount USING CONNECTION fr_conn")
    val v0 = spark.sql("SELECT count(*) FROM fmount.live.growing")
      .head.getLong(0)
    assert(v0 == 3, s"mount-time read: $v0")
    // the FOREIGN system commits a new version after the mount
    CommitWriter.append(spark, region.limit(2), tbl)
    val v1 = spark.sql("SELECT count(*) FROM fmount.live.growing")
      .head.getLong(0)
    assert(v1 == 5, s"post-append read through the mount: $v1 (want 5)")
    // and a table CREATED after the mount resolves too (lazy lookup
    // walks the live directory tree, not a mount-time listing)
    CommitWriter.createTable(spark, region.limit(1), s"$root/live/newborn")
    assert(spark.sql("SELECT count(*) FROM fmount.live.newborn")
      .head.getLong(0) == 1)
    g.sql("DROP CATALOG fmount")
    g.sql("DROP CONNECTION fr_conn")
  }

  test("foreign catalog IF NOT EXISTS: a second session's idempotent " +
    "re-run still gets the session-local data-plane binding") {
    val g = GraftSession(spark)
    LocalCatalog.clear()
    val root = graft.queries.DeltaQueries.foreignSystemRoot(spark, sf)
    g.sql(s"CREATE CONNECTION fs_conn2 TYPE filesystem URL 'file://$root'")
    g.sql("CREATE FOREIGN CATALOG mounted2 USING CONNECTION fs_conn2")
    // the securable registry is JVM-global, but the mount is SESSION
    // conf: a fresh session re-running the idempotent create must get
    // its own binding, not a no-op that leaves its reads failing
    val s2 = spark.newSession()
    assert(s2.conf.getOption("spark.sql.catalog.mounted2").isEmpty)
    GraftSession(s2).sql(
      "CREATE FOREIGN CATALOG IF NOT EXISTS mounted2 " +
        "USING CONNECTION fs_conn2")
    assert(s2.conf.getOption("spark.sql.catalog.mounted2")
      .contains(classOf[graft.catalog.ForeignCatalog].getName))
    assert(s2.sql("SELECT count(*) FROM mounted2.analytics.nations_live")
      .head.getLong(0) > 0)
    GraftSession(spark).sql("DROP CATALOG mounted2")
    g.sql("DROP CONNECTION fs_conn2")
  }

  test("vacuum: dry run lists unreferenced files, real run deletes them") {
    val path = tmpTable("vacuum")
    CommitWriter.createTable(spark, region.repartition(2), path)
    val snap0 = DeltaTable.forPath(spark, path)
    val files0 = snap0.allFiles.select("path").collect().map(_.getString(0))
    assert(files0.length >= 2)
    // remove one file from the table (it becomes unreferenced garbage)
    CommitWriter.commitRemoves(spark, path, Seq(files0.head))

    val g = GraftSession(spark)
    val dry = g.sql(s"VACUUM '$path' RETAIN 0 HOURS DRY RUN").collect()
    assert(dry.length == 1)
    assert(dry.head.getAs[String]("path").endsWith(files0.head))

    val countAfterRemove = DeltaTable.forPath(spark, path).read.count()
    val metrics = g.sql(s"VACUUM '$path' RETAIN 0 HOURS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_deleted") == "1")
    assert(metrics("bytes_deleted").toLong > 0)
    // table still reads fine; live rows untouched by the vacuum
    assert(DeltaTable.forPath(spark, path).read.count() == countAfterRemove)
  }

  test("vacuum lite: tombstone-derived candidates, zero directory listings") {
    val path = tmpTable("vacuum_lite")
    CommitWriter.createTable(spark, region.repartition(2), path)
    val files0 = DeltaTable.forPath(spark, path)
      .allFiles.select("path").collect().map(_.getString(0))
    assert(files0.length >= 2)
    CommitWriter.commitRemoves(spark, path, Seq(files0.head))
    // untracked debris the log never saw: FULL finds it, LITE must not
    val debris = new java.io.File(path, "debris.bin")
    java.nio.file.Files.write(debris.toPath, Array[Byte](1, 2, 3))
    debris.setLastModified(System.currentTimeMillis() - 3600_000L)

    val g = GraftSession(spark)
    val before = graft.ops.DirListing.recursiveListings.get()
    val lite = g.sql(s"VACUUM '$path' LITE RETAIN 0 HOURS DRY RUN").collect()
    assert(graft.ops.DirListing.recursiveListings.get() == before,
      "VACUUM LITE must not run a directory listing")
    assert(lite.length == 1)
    assert(lite.head.getAs[String]("path").endsWith(files0.head))
    assert(lite.head.getAs[Long]("length") > 0L)

    val full = g.sql(s"VACUUM '$path' FULL RETAIN 0 HOURS DRY RUN").collect()
    assert(graft.ops.DirListing.recursiveListings.get() == before + 1)
    assert(full.map(_.getAs[String]("path")).toSet ==
      lite.map(_.getAs[String]("path")).toSet +
        s"file:${debris.getAbsolutePath}",
      "on a table with untracked debris FULL = LITE + debris")

    // real LITE run deletes the tombstoned file and only it
    val live = DeltaTable.forPath(spark, path).read.count()
    val metrics = g.sql(s"VACUUM '$path' LITE RETAIN 0 HOURS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_deleted") == "1")
    assert(debris.exists(), "LITE must not touch untracked files")
    assert(DeltaTable.forPath(spark, path).read.count() == live)
  }

  test("vacuum lite: latest-action-wins across remove/re-add/remove and a checkpoint") {
    import graft.delta.log.Actions.AddFile
    val path = tmpTable("vacuum_lite_cp")
    // high interval so only the explicit checkpoint below exists
    CommitWriter.createTable(spark, region.repartition(2), path,
      configuration = Map("delta.checkpointInterval" -> "1000"))
    val adds0 = DeltaTable.forPath(spark, path).allFiles
      .select("path", "size").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val (fileA, sizeA) = adds0.head
    val g = GraftSession(spark)

    def liteCandidates(): Set[String] =
      g.sql(s"VACUUM '$path' LITE RETAIN 0 HOURS DRY RUN").collect()
        .map(_.getAs[String]("path")).toSet

    // v1: remove A; checkpoint at v1 retains the tombstone — LITE must
    // surface a candidate whose remove action lives ONLY in the checkpoint
    CommitWriter.commitRemoves(spark, path, Seq(fileA))
    CommitWriter.checkpoint(spark, path)
    assert(liteCandidates().exists(_.endsWith(fileA)),
      "tombstone retained in the checkpoint must stay a LITE candidate")

    // v2: re-add A (commit add beats the checkpointed tombstone:
    // commit_version 2 > checkpoint version 1) — candidate set empties
    CommitWriter.commit(spark, path, 2, Seq(CommitWriter.addJson(AddFile(
      fileA, Map.empty, sizeA, System.currentTimeMillis(),
      dataChange = true, stats = None))), operation = "WRITE")
    assert(liteCandidates().isEmpty,
      "a re-added path's latest action is the add; it must not be vacuumed")

    // v3: remove A again — candidate again, listed exactly once
    CommitWriter.commitRemoves(spark, path, Seq(fileA))
    val cand = g.sql(s"VACUUM '$path' LITE RETAIN 0 HOURS DRY RUN").collect()
    assert(cand.count(_.getAs[String]("path").endsWith(fileA)) == 1)
    assert(cand.length == 1)
    // and the size joined from the log's add actions survives the churn
    assert(cand.head.getAs[Long]("length") == sizeA)
  }

  test("vacuum lite: absolute/URI tombstones outside the root are skipped") {
    val path = tmpTable("vacuum_lite_abs")
    CommitWriter.createTable(spark, region.repartition(2), path)
    val files0 = DeltaTable.forPath(spark, path)
      .allFiles.select("path").collect().map(_.getString(0))
    // the log permits absolute paths/URIs in remove actions (e.g.
    // tombstones naming a shallow-clone's source files) — LITE must
    // neither garble them with a root prefix nor reach outside the table
    CommitWriter.commitRemoves(spark, path, Seq(
      files0.head,
      "file:/definitely/elsewhere/ghost.parquet",
      "/also/elsewhere/ghost2.parquet"))
    val cand = GraftSession(spark)
      .sql(s"VACUUM '$path' LITE RETAIN 0 HOURS DRY RUN").collect()
      .map(_.getAs[String]("path"))
    assert(cand.length == 1 && cand.head.endsWith(files0.head))
    assert(!cand.exists(_.contains("elsewhere")))
  }

  test("vacuum lite: reclaims orphaned DV files, spares live-referenced ones") {
    import org.apache.hadoop.fs.Path
    import graft.delta.scan.DvBitmap
    val path = tmpTable("vacuum_lite_dv")
    // two known files: A holds keys 0-1, B holds keys 2-4
    CommitWriter.createTable(spark,
      region.where(col("r_regionkey") < 2).repartition(1), path,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val fileA = DeltaTable.forPath(spark, path)
      .allFiles.select("path").collect().head.getString(0)
    CommitWriter.append(spark,
      region.where(col("r_regionkey") >= 2).repartition(1), path)
    // one DV per file via two separate DV-backed deletes
    graft.commands.DmlCommands.delete(spark, path, col("r_regionkey") === 0)
    graft.commands.DmlCommands.delete(spark, path, col("r_regionkey") === 2)
    val snap = DeltaTable.forPath(spark, path)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(new Path(path)).toString
    val dvByFile = snap.allFiles
      .where(col("deletionVector").isNotNull)
      .select("path", "deletionVector.storageType",
        "deletionVector.pathOrInlineDv").collect()
      .map(r => r.getString(0) -> DvBitmap.dvPath(new Path(root),
        graft.delta.log.Actions.DeletionVectorDescriptor(
          r.getString(1), r.getString(2), None, 0, 0L)).toString)
      .toMap
    assert(dvByFile.size == 2, s"expected a DV on both files: $dvByFile")
    val (dvA, dvB) = (dvByFile(fileA),
      dvByFile.collectFirst { case (f, p) if f != fileA => p }.get)

    // tombstone file A: LITE must list A AND its now-orphaned DV file,
    // and must spare B's DV (still referenced by the live snapshot)
    CommitWriter.commitRemoves(spark, path, Seq(fileA))
    val g = GraftSession(spark)
    val cand = g.sql(s"VACUUM '$path' LITE RETAIN 0 HOURS DRY RUN").collect()
    val candPaths = cand.map(_.getAs[String]("path")).toSet
    assert(candPaths.exists(_.endsWith(fileA)))
    assert(candPaths.contains(dvA), s"orphaned DV missing: $dvA vs $candPaths")
    assert(!candPaths.contains(dvB), "live-referenced DV must be spared")
    assert(cand.length == 2)
    // DV rows carry no length (the log records bitmap size, not file size)
    assert(cand.filter(_.getAs[String]("path") == dvA).head.isNullAt(
      cand.head.fieldIndex("length")))

    // the real run deletes both and the table still reads
    val before = DeltaTable.forPath(spark, path).read.count()
    g.sql(s"VACUUM '$path' LITE RETAIN 0 HOURS").collect()
    assert(!fs.exists(new Path(dvA)))
    assert(fs.exists(new Path(dvB)))
    assert(DeltaTable.forPath(spark, path).read.count() == before)
  }

  test("vacuum lite: tombstone-carried DV survives a checkpoint compacting the add away") {
    import org.apache.hadoop.fs.Path
    import graft.delta.scan.DvBitmap
    val path = tmpTable("vacuum_lite_dv_cp")
    CommitWriter.createTable(spark,
      region.where(col("r_regionkey") < 2).repartition(1), path,
      configuration = Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.checkpointInterval" -> "1000"))
    val fileA = DeltaTable.forPath(spark, path)
      .allFiles.select("path").collect().head.getString(0)
    CommitWriter.append(spark,
      region.where(col("r_regionkey") >= 2).repartition(1), path)
    // partial DV delete, then a second delete covering A's remaining
    // rows: the resulting plain remove carries A's PRIOR descriptor —
    // the only carrier once a checkpoint compacts the superseded add
    graft.commands.DmlCommands.delete(spark, path, col("r_regionkey") === 0)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(new Path(path)).toString
    val d1 = DeltaTable.forPath(spark, path).allFiles
      .where(col("path") === fileA)
      .select("deletionVector.storageType", "deletionVector.pathOrInlineDv")
      .collect().head
    val d1Path = DvBitmap.dvPath(new Path(root),
      graft.delta.log.Actions.DeletionVectorDescriptor(
        d1.getString(0), d1.getString(1), None, 0, 0L)).toString
    graft.commands.DmlCommands.delete(spark, path, col("r_regionkey") === 1)
    CommitWriter.checkpoint(spark, path)

    val cand = GraftSession(spark)
      .sql(s"VACUUM '$path' LITE RETAIN 0 HOURS DRY RUN").collect()
      .map(_.getAs[String]("path")).toSet
    assert(cand.exists(_.endsWith(fileA)), s"data file missing: $cand")
    assert(cand.contains(d1Path),
      s"checkpoint-surviving tombstone DV not reclaimed: $d1Path vs $cand")
  }

  test("vacuum: retention check blocks short RETAIN when property set") {
    val path = tmpTable("vacuum_check")
    CommitWriter.createTable(spark, region, path,
      configuration = Map(
        "delta.deletedFileRetentionDuration" -> "interval 7 days"))
    val g = GraftSession(spark)
    val err = intercept[IllegalArgumentException] {
      g.sql(s"VACUUM '$path' RETAIN 1 HOURS")
    }
    assert(err.getMessage.contains("shorter than the minimum"))
    // disabling the check allows it
    spark.conf.set(
      "spark.lakehouse.delta.retention_duration_check.enabled", "false")
    try g.sql(s"VACUUM '$path' RETAIN 1 HOURS").collect()
    finally spark.conf.set(
      "spark.lakehouse.delta.retention_duration_check.enabled", "true")
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES: commit, enforce, refuse") {
    val p = tmpTable("tblprops")
    CommitWriter.createTable(spark, region, p)
    val g = GraftSession(spark)
    // parse forms: quoted and bare keys, multiple props
    assert(GraftParser.parse(
      "ALTER TABLE t SET TBLPROPERTIES ('a' = '1', b = '2')") ==
      Some(SetTblPropertiesStatement("t", Seq("a" -> "1", "b" -> "2"))))
    assert(GraftParser.parse("ALTER TABLE t UNSET TBLPROPERTIES ('a', b)") ==
      Some(UnsetTblPropertiesStatement("t", Seq("a", "b"))))
    // set takes effect as a metadata commit with live semantics:
    // appendOnly set via SQL must block DML immediately
    g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      "('delta.appendOnly' = 'true', 'team' = 'ml')")
    val conf = DeltaTable.forPath(spark, p).metadata.configuration
    assert(conf("delta.appendOnly") == "true" && conf("team") == "ml")
    CommitWriter.append(spark, region.limit(1), p) // appends still fine
    intercept[IllegalArgumentException] {
      graft.commands.DmlCommands.delete(spark, p, col("r_regionkey") === 0)
    }
    // unset releases it
    g.sql(s"ALTER TABLE '$p' UNSET TBLPROPERTIES ('delta.appendOnly')")
    graft.commands.DmlCommands.delete(spark, p, col("r_regionkey") === 0)
    assert(!DeltaTable.forPath(spark, p)
      .metadata.configuration.contains("delta.appendOnly"))
    // constraints route through ADD CONSTRAINT (which validates existing
    // rows), never through a raw property write
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
        "('delta.constraints.pos' = 'r_regionkey >= 0')")
    }
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
        "('delta.columnMapping.mode' = 'name')")
    }
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' UNSET TBLPROPERTIES " +
        "('delta.columnMapping.maxColumnId')")
    }
  }

  test("vacuum never deletes live files or _delta_log") {
    val path = tmpTable("vacuum_safe")
    CommitWriter.createTable(spark, region.repartition(2), path)
    val g = GraftSession(spark)
    val before = DeltaTable.forPath(spark, path).read.count()
    val metrics = g.sql(s"VACUUM '$path' RETAIN 0 HOURS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_deleted") == "0")
    assert(DeltaTable.forPath(spark, path).read.count() == before)
  }

  test("vacuum reclaims expired _change_data files, keeps _delta_log") {
    val path = tmpTable("vacuum_cdc")
    CommitWriter.createTable(spark, region, path,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    graft.commands.DmlCommands.delete(spark, path, col("r_regionkey") === 0)
    val cdcDir = new java.io.File(path, "_change_data")
    val cdcFiles = cdcDir.listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(cdcFiles.nonEmpty)

    val g = GraftSession(spark)
    val dry = g.sql(s"VACUUM '$path' RETAIN 0 HOURS DRY RUN").collect()
      .map(_.getAs[String]("path"))
    assert(dry.exists(_.contains("_change_data/")),
      s"expired cdc file not listed: ${dry.mkString(",")}")
    assert(!dry.exists(_.contains("_delta_log")))

    val metrics = g.sql(s"VACUUM '$path' RETAIN 0 HOURS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_deleted").toLong >= cdcFiles.length.toLong)
    assert(cdcDir.listFiles() == null ||
      !cdcDir.listFiles().exists(_.getName.endsWith(".parquet")))
    // the table itself still reads (live data files untouched)
    assert(DeltaTable.forPath(spark, path).read
      .where(col("r_regionkey") === 0).count() == 0)
    // a CDF read over the vacuumed span fails with an actionable error
    val e = intercept[IllegalStateException] {
      spark.read.format("graftdelta")
        .option("path", path).option("startingVersion", "1")
        .option("readChangeFeed", "true").load().count()
    }
    assert(e.getMessage.contains("VACUUM"), e.getMessage)
  }

  test("qualified-name resolution: foreign catalogs and dotted idents") {
    import graft.catalog.GraftCatalog
    val path = tmpTable("qual_res")
    CommitWriter.createTable(spark, region, path)
    GraftCatalog.register("resdb", "res_t", path)
    try {
      // splitRef: dots inside backticks are NOT qualifier separators
      assert(GraftCatalog.splitRef("cat.db.tbl") == Seq("cat", "db", "tbl"))
      assert(GraftCatalog.splitRef("`a.b`.tbl") == Seq("a.b", "tbl"))
      assert(GraftCatalog.splitRef("`x.y.z`") == Seq("x.y.z"))
      // 2-part resolves through the registry
      assert(GraftCatalog.lookupPath(Seq("resdb", "res_t")).contains(path))
      // a 3-part name under a FOREIGN catalog must NOT strip-resolve
      // into graft's registry (spark_catalog.resdb.res_t is another
      // catalog's table, even if the suffix matches ours)
      assert(GraftCatalog.lookupPath(
        Seq("spark_catalog", "resdb", "res_t")).isEmpty)
      // ... while a graft-owned catalog name may strip (securable)
      val g = GraftSession(spark)
      g.sql("DROP CATALOG IF EXISTS res_cat CASCADE")
      g.sql("CREATE CATALOG res_cat")
      assert(GraftCatalog.lookupPath(
        Seq("res_cat", "resdb", "res_t")).contains(path))
      g.sql("DROP CATALOG res_cat CASCADE")
      // end-to-end: a command on the qualified name reaches the table
      assert(g.sql("DESCRIBE DETAIL resdb.res_t")
        .collect().head.getAs[String]("location") == path)
      // a quoted identifier containing a literal dot survives the
      // parse → render → split round trip as ONE part: the parser
      // re-backticks it and resolution reaches the registered table
      // instead of exploding the name into bogus qualifiers
      assert(GraftParser.parse("DESCRIBE DETAIL resdb.`dot.ted`") ==
        Some(DescribeDetailStatement("resdb.`dot.ted`")))
      GraftCatalog.register("resdb", "dot.ted", path)
      assert(g.sql("DESCRIBE DETAIL resdb.`dot.ted`")
        .collect().head.getAs[String]("location") == path)
    } finally {
      GraftCatalog.unregister("resdb", "res_t")
      GraftCatalog.unregister("resdb", "dot.ted")
    }
  }

  test("table registry auto-refresh") {
    val path = tmpTable("registry")
    CommitWriter.createTable(spark, region.filter(col("r_regionkey") < 3), path)
    val g = GraftSession(spark).registerDelta("reg_t", path)
    assert(g.tables.table("reg_t").count() == 3)
    CommitWriter.append(spark, region.filter(col("r_regionkey") >= 3), path)
    // refresh-on-lookup sees the new version (reference A28 behavior)
    assert(g.tables.table("reg_t").count() == region.count())
    // and the temp view was re-published
    assert(spark.table("reg_t").count() == region.count())
  }

  test("sign_storage_url: local passthrough, remote rejected") {
    GraftSession.registerFunctions(spark)
    import spark.implicits._
    val out = Seq("/tmp/x.parquet", "file:/tmp/y").toDF("u")
      .selectExpr("sign_storage_url(u) AS s").collect().map(_.getString(0))
    assert(out.toSeq == Seq("/tmp/x.parquet", "file:/tmp/y"))
    // scheme dispatch: each remote family rejects with ITS store name
    // (the reference's per-store signer arms, sign_url.rs:178-193)
    def rejection(url: String): String = {
      val e = intercept[Exception] {
        Seq(url).toDF("u").selectExpr("sign_storage_url(u) AS s").collect()
      }
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).find(m => m != null &&
          (m.contains("signer") || m.contains("signing")))
        .getOrElse(fail(s"no signer message in $e"))
    }
    assert(rejection("s3://bucket/k").contains("AmazonS3"))
    assert(rejection("abfss://c@a.dfs.example/k").contains("MicrosoftAzure"))
    assert(rejection("gs://bucket/k").contains("GoogleCloudStorage"))
    // a scheme with no registered signer is "not a signing store"
    // (sign_url.rs:210), distinct from a known-but-unavailable one
    assert(rejection("ftp://host/k").contains("not a signing store"))
    // a custom signer plugs into the seam per scheme
    graft.functions.UrlSigning.register(
      new graft.functions.StorageUrlSigner {
        val schemes = Seq("mock")
        def sign(u: java.net.URI, e: Long) = s"$u?sig=test&exp=$e"
      })
    val signed = Seq("mock://b/k").toDF("u")
      .selectExpr("sign_storage_url(u) AS s").collect().head.getString(0)
    assert(signed == "mock://b/k?sig=test&exp=3600")
    // null in → null out
    assert(Seq[String](null).toDF("u")
      .selectExpr("sign_storage_url(u) AS s").collect().head.isNullAt(0))
    // URI-illegal chars in a SCHEME-LESS path are still a legitimate
    // local path (space, braces): passthrough, never null
    val odd = Seq("/data/my file.parquet", "/d/{x}.parquet").toDF("u")
      .selectExpr("sign_storage_url(u) AS s").collect().map(_.getString(0))
    assert(odd.toSeq == Seq("/data/my file.parquet", "/d/{x}.parquet"))
  }

  test("SQL DML: DELETE FROM / UPDATE SET / MERGE INTO route to commands") {
    val p = tmpTable("sql_dml")
    CommitWriter.createTable(spark, region, p)
    val g = GraftSession(spark)

    // parse shapes
    assert(GraftParser.parse("DELETE FROM t WHERE a < 5") ==
      Some(GraftParser.DeleteStatement("t", Some("a < 5"))))
    assert(GraftParser.parse("UPDATE t SET a = a + 1, b = 'x, y' WHERE c = 2") ==
      Some(GraftParser.UpdateStatement("t",
        Seq("a" -> "a + 1", "b" -> "'x, y'"), Some("c = 2"))))
    assert(GraftParser.parse(
      "MERGE INTO t USING s ON t.k = s.k AND t.j = s.j " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *") ==
      Some(GraftParser.MergeStatement("t", "s", Seq("k", "j"))))
    intercept[GraftParser.ParseException] {
      GraftParser.parse("MERGE INTO t USING s ON t.k = s.other " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    intercept[GraftParser.ParseException] {
      GraftParser.parse("UPDATE t SET WHERE c = 2")
    }

    // end-to-end on a real table
    g.sql(s"DELETE FROM '$p' WHERE r_regionkey = 4")
    assert(DeltaTable.forPath(spark, p).read
      .where(col("r_regionkey") === 4).count() == 0)

    g.sql(s"UPDATE '$p' SET r_name = 'edited' WHERE r_regionkey = 0")
    val edited = DeltaTable.forPath(spark, p).read
      .where(col("r_regionkey") === 0).select("r_name").head.getString(0)
    assert(edited == "edited")

    region.where(col("r_regionkey") <= 1)
      .withColumn("r_name", lit("MERGED"))
      .createOrReplaceTempView("sql_dml_src")
    g.sql(s"MERGE INTO '$p' USING sql_dml_src ON t.r_regionkey = s.r_regionkey " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val after = DeltaTable.forPath(spark, p).read
    assert(after.where(col("r_name") === "MERGED").count() == 2)

    // DELETE without WHERE empties the table
    g.sql(s"DELETE FROM '$p'")
    assert(DeltaTable.forPath(spark, p).read.count() == 0)
  }

  test("dir listing matches reference schema") {
    val df = graft.ops.DirListing.list(spark, sf)
    assert(df.schema.fieldNames.toSeq ==
      Seq("path", "length", "is_dir", "modification_time"))
    assert(df.count() >= 10) // the parquet files
    val rec = graft.ops.DirListing.listRecursive(spark, sf)
    assert(rec.where(col("is_dir")).count() == 0)
    assert(rec.count() >= df.where(!col("is_dir")).count())
  }
}
