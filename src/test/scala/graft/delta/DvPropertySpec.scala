package graft.delta

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.LogSegment
import graft.delta.scan.DvBitmap

/** Property-style tests over the deletion-vector codec (seeded random
  * generation — deterministic across runs): ANY set of row indexes must
  * round-trip exactly through write (portable roaring + file framing)
  * and load. The codec is a protocol surface where a mis-sorted
  * container or an off-by-one in the framing silently drops or
  * resurrects rows. */
class DvPropertySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tableDir =
    java.nio.file.Files.createTempDirectory("dvprop").toString
  private lazy val fs = LogSegment.fs(spark, new Path(tableDir))

  private def roundtrip(rows: Seq[Long]): Unit = {
    val sorted = rows.distinct.sorted
    val dv = DvBitmap.writeDvFile(fs, new Path(tableDir), sorted)
    val bm = DvBitmap.load(fs, new Path(tableDir), dv)
    assert(bm.cardinality == sorted.length.toLong,
      s"cardinality for n=${sorted.length}")
    assert(bm.iterator.toSeq == sorted, s"iterator for n=${sorted.length}")
    val set = sorted.toSet
    for (r <- sorted.take(50)) {
      assert(bm.contains(r))
      if (!set.contains(r + 1)) assert(!bm.contains(r + 1))
    }
  }

  test("roundtrip: sparse random row sets (array containers)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val n = rnd.nextInt(2000)
      roundtrip(Seq.fill(n)(rnd.nextLong(1000000L)))
    }
  }

  test("roundtrip: dense runs (bitmap containers beyond 4096/container)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val start = rnd.nextLong(100000L)
      val len = 1 + rnd.nextInt(40000) // spans containers, forces bitmaps
      roundtrip(start until (start + len))
    }
    roundtrip(0L until 65536L) // one completely full container
  }

  test("roundtrip: values crossing the 16-bit container boundary") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 20) {
      val key = rnd.nextInt(6).toLong
      val n = 1 + rnd.nextInt(200)
      val boundary = (key << 16) + 65536L
      roundtrip((boundary - n) until (boundary + n))
    }
  }

  test("roundtrip: scattered across high 32-bit keys") {
    val rnd = new scala.util.Random(1337)
    for (trial <- 1 to 20) {
      val n = rnd.nextInt(500)
      roundtrip(Seq.fill(n)(rnd.nextLong(1L << 32)))
    }
  }

  test("z85 codec roundtrips arbitrary 4-byte-aligned payloads") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 50) {
      val bytes = new Array[Byte](4 * (1 + rnd.nextInt(64)))
      rnd.nextBytes(bytes)
      val decoded = DvBitmap.z85Decode(DvBitmap.z85Encode(bytes))
      assert(decoded.toSeq == bytes.toSeq)
    }
  }

  test("roundtrip: singletons and extremes; empty DV rejected") {
    roundtrip(Seq(0L))
    roundtrip(Seq((1L << 32) - 1))
    // the protocol has no zero-cardinality DV — writing one is a caller
    // bug and must fail loudly, not produce an unreadable descriptor
    intercept[IllegalArgumentException] {
      DvBitmap.serialize(Seq.empty)
    }
  }
}
