package graft

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Fixture staleness stamps must be CONTENT-derived: the driver
  * regenerates /root/testdata between rounds, and a regeneration that
  * preserves byte counts and timestamps (cp -p / rsync -a of an
  * equal-length drop) must still invalidate every fixture built from
  * the previous drop — a stale fixture silently diverges from the
  * oracle, which always reads the live parquet. */
class FixtureSigSpec extends AnyFunSuite {

  private def tmpDrop(): File = {
    val d = Files.createTempDirectory("graft_sig").toFile
    d.deleteOnExit()
    d
  }

  test("same-length same-mtime content change flips the fixture stale") {
    val drop = tmpDrop()
    val src = new File(drop, "toy.parquet")
    Files.write(src.toPath, "AAAA-content".getBytes("UTF-8"))
    val mtime = src.lastModified()

    val fixture = new File(drop, "fixture").getAbsolutePath
    new File(fixture).mkdirs()
    graft.queries.DeltaQueries.writeStamp(fixture, drop.getAbsolutePath)
    assert(!graft.queries.DeltaQueries.stale(fixture, drop.getAbsolutePath))

    // the regeneration a (size, mtime) signature cannot see: identical
    // byte length, identical mtime, different bytes. Regeneration
    // happens at round boundaries (a fresh JVM), simulated here by
    // clearing the in-process hash memo.
    Files.write(src.toPath, "BBBB-content".getBytes("UTF-8"))
    assert(src.setLastModified(mtime))
    assert(src.length() == "AAAA-content".length)
    graft.queries.DeltaQueries.resetHashMemoForTest()
    assert(graft.queries.DeltaQueries.stale(fixture, drop.getAbsolutePath),
      "content change hidden behind preserved size+mtime not detected")
  }

  test("a new parquet appearing or one vanishing flips stale") {
    val drop = tmpDrop()
    Files.write(new File(drop, "a.parquet").toPath, "a".getBytes)
    val fixture = new File(drop, "fx").getAbsolutePath
    new File(fixture).mkdirs()
    graft.queries.DeltaQueries.writeStamp(fixture, drop.getAbsolutePath)
    Files.write(new File(drop, "b.parquet").toPath, "b".getBytes)
    assert(graft.queries.DeltaQueries.stale(fixture, drop.getAbsolutePath))
    new File(drop, "b.parquet").delete()
    assert(!graft.queries.DeltaQueries.stale(fixture, drop.getAbsolutePath))
    new File(drop, "a.parquet").delete()
    assert(graft.queries.DeltaQueries.stale(fixture, drop.getAbsolutePath))
  }

  test("the IVF/PQ index chain rebuilds on a content change hidden " +
    "behind a preserved mtime") {
    import TestSpark.spark
    import graft.queries.SimilarityQueries
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a private embeddings drop this test owns (unique basename keys a
    // private fixture dir under target/delta_fixtures)
    val drop = Files.createTempDirectory("graft_idxsig_drop").toFile
    drop.deleteOnExit()
    val src = new File(drop, "embeddings.parquet")
    def writeEmb(n: Int): Unit = {
      val staging = new File(drop, ".staging")
      (0 until n).map(i => (i.toLong, (i % 3).toLong,
        Seq.tabulate(64)(d => (((i * 31 + d * 7) % 13) - 6).toFloat)))
        .toDF("vec_id", "label", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(staging.getAbsolutePath)
      val part = staging.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, src.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(staging)
    }
    try {
      writeEmb(150)
      val mtime = src.lastModified()
      // build the DEEPEST derivation — it pulls the whole chain
      // (ivf index -> per-column PQ codes -> packed projection)
      val (packed1, _) = SimilarityQueries.pqPackedIndexWithIvf(
        spark, drop.getAbsolutePath)
      assert(graft.delta.IndexStore.data(spark, packed1).count() == 150)
      // regenerate the drop with DIFFERENT content but the SAME mtime —
      // the case an mtime guard waves through (driver regeneration with
      // timestamp-preserving copies; also any rebuild landing within
      // filesystem mtime granularity). Fresh-JVM simulation: clear the
      // in-process content-hash memo, as the round boundary would.
      writeEmb(100)
      assert(src.setLastModified(mtime))
      graft.queries.DeltaQueries.resetHashMemoForTest()
      val (packed2, ivf2) = SimilarityQueries.pqPackedIndexWithIvf(
        spark, drop.getAbsolutePath)
      assert(packed2 == packed1)
      assert(graft.delta.IndexStore.data(spark, packed2).count() == 100,
        "packed PQ index served stale codes after a same-mtime regeneration")
      // the upstream links re-derived too, not just the leaf
      assert(graft.delta.IndexStore.data(spark, ivf2).count() == 100)
      assert(graft.delta.IndexStore.data(spark, packed2)
        .where(col("vec_id") >= 100).count() == 0)
    } finally {
      // the builders refresh the GLOBAL oracle alias symlinks (ivf,
      // pq, pq_packed) to this private fixture; point them back at the
      // suite's sf before any later spec reads them
      SimilarityQueries.pqPackedIndexWithIvf(spark, TestSpark.sf)
    }
  }
}
