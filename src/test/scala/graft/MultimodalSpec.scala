package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The multimodal codecs are REAL (javax.imageio PNG, javax.sound WAV,
  * framed-PNG video): these pin the encode→decode roundtrip against the
  * closed-form generation formulas — the same contract the sidecar
  * oracle checks end-to-end through parquet.
  */
class MultimodalSpec extends AnyFunSuite {

  test("encode→decode roundtrip equals the formulas for every kind") {
    for (id <- 0L to 60L) {
      val row = Multimodal.encode(id)
      assert(row.kind == Multimodal.kindOf(id))
      val d = Multimodal.decode(row.kind, row.payload)
      val e = Multimodal.expected(id)
      assert(d == e, s"id=$id kind=${row.kind}: decoded $d expected $e")
    }
  }

  test("payloads are real container formats, not byte arithmetic") {
    // PNG signature
    val img = Multimodal.encode(0L).payload // id%3==0 -> image
    assert((img(0) & 0xFF) == 0x89 && img(1) == 'P' && img(2) == 'N' &&
      img(3) == 'G', "image payload must start with the PNG signature")
    // RIFF/WAVE header
    val wav = Multimodal.encode(1L).payload
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
      "audio payload must be a RIFF/WAVE container")
    // video container magic + per-frame PNGs
    val vid = Multimodal.encode(2L).payload
    assert(new String(vid.slice(0, 4), "US-ASCII") == "GFV1")
    val frames = java.nio.ByteBuffer.wrap(vid, 4, 4).getInt
    assert(frames == Multimodal.videoFrameCount(2L))
  }

  test("video frames decode independently with distinct sums") {
    // id=5 -> video (5%3==2), 3+ frames; frame sums must differ (the
    // per-frame pixel offset is real, not a repeated first frame)
    val id = 5L
    val d = Multimodal.decode("video", Multimodal.encode(id).payload)
    assert(d.frameSums.length == Multimodal.videoFrameCount(id))
    assert(d.frameSums.distinct.length > 1,
      "frames must not be copies of each other")
  }

  test("resize roundtrip: downsampled payload re-decodes to the strided formulas") {
    for (id <- 0L to 60L; factor <- Seq(2, 3)) {
      val row = Multimodal.encode(id)
      val resized = Multimodal.resize(row.kind, row.payload, factor)
      val d = Multimodal.decode(row.kind, resized)
      val e = Multimodal.expectedResized(id, factor)
      assert(d == e, s"id=$id f=$factor kind=${row.kind}: got $d expected $e")
      // the resized payload is itself a real container of the same kind
      row.kind match {
        case "image" => assert((resized(0) & 0xFF) == 0x89)
        case "audio" =>
          assert(new String(resized.slice(0, 4), "US-ASCII") == "RIFF")
          // the header rate must DROP with the decimation, or an
          // external player would render a time-compressed,
          // pitch-shifted clip (the in-framework decode ignores the
          // header rate, so only this pin catches it)
          val srcAis = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(row.payload))
          val srcRate = try srcAis.getFormat.getSampleRate
            finally srcAis.close()
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(resized))
          val rate = try ais.getFormat.getSampleRate finally ais.close()
          val want = (srcRate / factor).toInt.toFloat
          assert(rate == want, s"resized WAV rate $rate, want $want")
        case _ =>
          assert(new String(resized.slice(0, 4), "US-ASCII") == "GFV1")
      }
      // and it genuinely shrank (strictly fewer raster/sample values
      // whenever the source had more than one)
      val orig = Multimodal.expected(id)
      assert(orig.width == 1 || d.width < orig.width)
    }
  }

  test("decode rejects payloads of the wrong kind") {
    val wav = Multimodal.encode(1L).payload
    intercept[Exception](Multimodal.decode("image", wav))
    intercept[Exception](Multimodal.decode("video", wav))
    intercept[Exception](Multimodal.decode("text", wav))
  }
}
