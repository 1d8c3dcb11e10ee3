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
}
