package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench headline's contention self-diagnosis: spread_flags
  * must be valid JSON, flag exactly the untrustworthy samples, and cap
  * its size (the driver keeps ~2000 chars of stdout). */
class BenchArtifactSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("spread_flags flags only contended queries, parseable JSON") {
    val rs = Seq(
      Bench.BenchResult("steady", 1.0, 0.95, 1.10, None),
      Bench.BenchResult("contended", 2.0, 1.0, 5.4, None),
      // 9x ratio but sub-0.5s absolute: micro-query jitter, not flagged
      Bench.BenchResult("tiny_jitter", 0.02, 0.01, 0.09, None),
      // 1s apart but under the 2.5x ratio: steady-enough, not flagged
      Bench.BenchResult("wide_slow", 10.0, 9.5, 10.5, None),
      Bench.BenchResult("broken", -1.0, -1.0, -1.0, Some("boom")))
    val node = mapper.readTree(Bench.spreadFlags(rs))
    assert(node.isObject)
    assert(node.size() == 1, node.toString)
    assert(node.get("contended").get("min").asDouble() == 1.0)
    assert(node.get("contended").get("max").asDouble() == 5.4)
    // no samples attached -> no pass can be adjudicated ambient
    assert(!node.get("contended").get("ambient").asBoolean())
  }

  test("flagged spreads carry the ambient adjudication: a co-inflated " +
    "pass marks its flags ambient, an isolated slowdown stays owned") {
    // synthetic contended window: pass 2 inflates MOST of the suite at
    // once (external load), while "self_slow"'s worst sample sits in a
    // clean pass — its spread is the query's own
    def r(name: String, secs: Seq[Double]) = {
      val samples = Vector(Bench.BenchSample(0, 0L, secs.head, None)) ++
        secs.tail.zipWithIndex.map { case (s, i) =>
          Bench.BenchSample(i + 1, 1000L * i, s, None) }
      Bench.summarize(name, samples)
    }
    val rs = Seq(
      // pass layout per query: (warmup, p1, p2, p3)
      r("a", Seq(1.0, 1.0, 3.1, 1.1)),
      r("b", Seq(2.0, 2.0, 6.0, 2.1)),
      r("c", Seq(0.5, 0.5, 1.9, 0.52)),
      r("d", Seq(0.4, 0.4, 1.3, 0.41)),
      // worst sample in pass 3, where nothing else inflates
      r("self_slow", Seq(1.0, 1.0, 1.05, 9.0)),
      // micro-query: must not vote in the inflation index
      r("tiny", Seq(0.01, 0.01, 0.09, 0.01)))
    val inflation = Bench.passInflation(rs)
    assert(inflation(2) >= 0.8, s"pass 2 should co-inflate: $inflation")
    assert(inflation(3) < 0.3, s"pass 3 is one query's own: $inflation")
    assert(Bench.ambientPasses(rs) == Set(2))
    val node = mapper.readTree(Bench.spreadFlags(rs))
    assert(node.get("a").get("ambient").asBoolean(), node.toString)
    assert(node.get("b").get("ambient").asBoolean(), node.toString)
    assert(!node.get("self_slow").get("ambient").asBoolean(), node.toString)
  }

  test("spread_flags caps at 8 entries plus a truncation marker") {
    val rs = (1 to 12).map(i =>
      Bench.BenchResult(s"q$i", 2.0, 1.0, 3.0 + i, None))
    val node = mapper.readTree(Bench.spreadFlags(rs))
    assert(node.size() == 9)
    assert(node.has("__truncated__"))
    // worst spreads first: q12 (spread 14) must be present, q1 dropped
    assert(node.has("q12") && !node.has("q1"))
  }

  test("spread_flags is empty on a clean run") {
    val rs = Seq(Bench.BenchResult("a", 1.0, 0.9, 1.1, None))
    assert(Bench.spreadFlags(rs) == "{}")
  }

  test("summarize discards the pass-0 warm-up from median/min/max") {
    // warm-up pass carries the first-touch cost (8.8s); warm passes are
    // fast — the reported stats must come from warm passes only
    val r = Bench.summarize("q", Vector(
      Bench.BenchSample(0, 1000L, 8.83, None),
      Bench.BenchSample(1, 2000L, 0.16, None),
      Bench.BenchSample(2, 3000L, 0.62, None),
      Bench.BenchSample(3, 4000L, 0.40, None)))
    assert(r.error.isEmpty)
    assert(r.median == 0.40 && r.min == 0.16 && r.max == 0.62)
    // the warm-up sample stays visible in samples_detail
    assert(r.samples.exists(s => s.pass == 0 && s.sec == 8.83))
  }

  test("summarize poisons on any failed sample, warm-up included") {
    val r = Bench.summarize("q", Vector(
      Bench.BenchSample(0, 1000L, -1.0, Some("OOM")),
      Bench.BenchSample(1, 2000L, 0.2, None),
      Bench.BenchSample(2, 3000L, 0.2, None)))
    assert(r.error.contains("OOM"))
    assert(r.median == -1.0 && r.min == -1.0 && r.max == -1.0)
    // warm-up-only vectors (no warm pass survived) also poison
    val r2 = Bench.summarize("q", Vector(
      Bench.BenchSample(0, 1000L, 1.0, None)))
    assert(r2.error.contains("no warm samples") && r2.median == -1.0)
  }

  test("samples_detail carries per-sample pass/start_ms/sec, parseable") {
    val rs = Seq(
      Bench.BenchResult("a", 1.0, 0.9, 1.1, None, Vector(
        Bench.BenchSample(1, 1000L, 0.9, None),
        Bench.BenchSample(2, 2000L, 1.0, None),
        Bench.BenchSample(3, 3000L, 1.1, None))),
      Bench.BenchResult("b", -1.0, -1.0, -1.0, Some("boom"), Vector(
        Bench.BenchSample(1, 1500L, -1.0, Some("X: \"quoted\" msg")))))
    val node = mapper.readTree(Bench.samplesDetailJson(rs))
    assert(node.isObject && node.size() == 2)
    val a = node.get("a")
    assert(a.size() == 3)
    assert(a.get(0).get("pass").asInt() == 1)
    assert(a.get(1).get("start_ms").asLong() == 2000L)
    assert(a.get(2).get("sec").asDouble() == 1.1)
    // error samples keep a (quote-escaped) err field and stay parseable
    val b0 = node.get("b").get(0)
    assert(b0.get("err").asText().contains("quoted"))
  }
}
