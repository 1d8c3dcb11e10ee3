package graft.tools

import org.apache.spark.sql.SparkSession

/** Audits every declared query with codegen fallback DISABLED: any query
  * whose generated code fails to compile (and would silently run
  * interpreted in production) is reported. */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.headOption
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_ == name)) {
      try {
        // mimic the Verify harness exactly: coalesce(1) fuses the whole
        // chain into one codegen unit — where giant methods blow up
        val out = java.nio.file.Files.createTempDirectory("cga").toString
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$out/x")
        println(s"[codegen] OK   $name")
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          println(s"[codegen] FAIL $name: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").take(200)}")
      }
    }
    spark.stop()
  }
}
