package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure codec/curve kernels whose bugs would be
  * silent data corruption at scale: a DV codec defect resurrects or
  * re-deletes rows on every masked read; a Hilbert defect silently
  * degrades (or breaks) clustered layout. The unit specs pin known
  * shapes; these laws hold over generated inputs.
  */
object CodecProperties extends Properties("graft.codecs") {

  import graft.delta.scan.DvBitmap

  /** Distinct row indexes mixing all three container shapes (sorted
    * array, 8 KiB bitmap via a >4096 run, multi-key spans > 2^32). */
  private val rowIndexes: Gen[Seq[Long]] = for {
    sparse <- Gen.listOfN(64, Gen.chooseNum(0L, (1L << 33) - 1))
    runStart <- Gen.chooseNum(0L, 1L << 20)
    runLen <- Gen.oneOf(8L, 5000L) // array vs bitmap container
    dense <- Gen.listOfN(128, Gen.chooseNum(0L, 65535L))
  } yield (sparse ++ (runStart until runStart + runLen) ++ dense)
    .distinct

  /** sign_storage_url is total over arbitrary strings: every input
    * yields passthrough (local), null (unparseable under a scheme), or
    * a TYPED rejection — never an unexpected crash — and scheme-less
    * inputs are never silently nulled. */
  property("UrlSigning.signUrl is total and local-preserving") =
    forAll(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.asciiPrintableStr.map(s => s"/data/$s"),
      Gen.asciiPrintableStr.map(s => s"s3://bucket/$s"),
      Gen.asciiPrintableStr.map(s => s"file:/tmp/$s"),
      Gen.asciiPrintableStr.map(s => s"zz-scheme://$s"))) { s =>
      try {
        val out = graft.functions.UrlSigning.signUrl(s)
        // scheme-less input must come back verbatim or (never) null
        val schemeless = !s.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:.*$")
        !schemeless || out == s
      } catch {
        case _: UnsupportedOperationException => true // typed rejection
      }
    }

  property("DV serialize/deserialize preserves the exact row set") =
    forAll(rowIndexes) { rows =>
      val set = rows.toSet
      val bm = DvBitmap.deserialize(DvBitmap.serialize(rows))
      // membership probes both present and absent indexes
      val probes = (0 until 256).forall { i =>
        val v = (rows.head + 7919L * i) & ((1L << 33) - 1)
        bm.contains(v) == set.contains(v)
      }
      bm.iterator.toSet == set && bm.cardinality == set.size && probes
    }

  property("z85 decode(encode(b)) == b, encoded length = len/4*5") =
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { l =>
      val bytes = l.take(l.size / 4 * 4).toArray
      val enc = DvBitmap.z85Encode(bytes)
      enc.length == bytes.length / 4 * 5 &&
        java.util.Arrays.equals(DvBitmap.z85Decode(enc), bytes)
    }

  import graft.operators.HilbertCurve

  private val curveCase: Gen[(Int, Int, Array[Long])] = for {
    n <- Gen.choose(1, 6)
    bits <- Gen.choose(1, math.min(10, 62 / n))
    coords <- Gen.listOfN(n, Gen.chooseNum(0L, (1L << bits) - 1))
  } yield (n, bits, coords.toArray)

  property("Hilbert index/coords are mutually inverse and in range") =
    forAll(curveCase) { case (n, bits, cs) =>
      val d = HilbertCurve.index(cs, bits)
      d >= 0 && d < (1L << (n * bits)) &&
        HilbertCurve.coords(d, bits, n).toSeq == cs.toSeq
    }

  property("Hilbert consecutive indexes are grid-adjacent") =
    forAll(for {
      n <- Gen.choose(1, 4)
      bits <- Gen.choose(1, math.min(8, 56 / n))
      d <- Gen.chooseNum(0L, (1L << (n * bits)) - 2)
    } yield (n, bits, d)) { case (n, bits, d) =>
      val a = HilbertCurve.coords(d, bits, n)
      val b = HilbertCurve.coords(d + 1, bits, n)
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum == 1L
    }
}
