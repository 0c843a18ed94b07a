package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class QueryBaselineSpec extends AnyFunSuite {

  test("regression flag fires on a deliberate >2x slowdown, and only then") {
    val pins = Map(
      "q01" -> 1.0, "q27" -> 2.0, "crawl_120000_urls" -> 6.0, "q30" -> 0.325)
    val observed = Seq(
      "q01" -> 1.9, // 1.9x — within tolerance
      "q27" -> 4.1, // 2.05x and +2.1s — FLAG
      "crawl_120000_urls" -> 30.0, // 5x — FLAG
      "q30" -> 0.66, // 2.03x but only +0.34s — sub-second jitter, NOT flagged
      "q99_new" -> 100.0, // unpinned — never flagged
      "q27_failed" -> -1.0) // failed query — reported via errors, not here
    val regs = QueryBaseline.regressions(observed, pins)
    assert(regs.map(_._1) === Seq("q27", "crawl_120000_urls"))
    assert(regs.head === (("q27", 4.1, 2.0)))
  }

  test("render/load round-trip; SF mismatch yields no pins") {
    val dir = Files.createTempDirectory("qb-spec")
    val f = dir.resolve("QUERY_BASELINE.json")
    Files.writeString(f, QueryBaseline.render("/data/sf0.1", Seq("q01" -> 1.234, "q02" -> 0.5)))
    assert(QueryBaseline.load(f, "/data/sf0.1") === Map("q01" -> 1.234, "q02" -> 0.5))
    // pins recorded at another SF are not comparable — gate disarms
    assert(QueryBaseline.load(f, "/data/sf0.01") === Map.empty)
    assert(QueryBaseline.load(dir.resolve("absent.json"), "/data/sf0.1") === Map.empty)
  }

  test("committed pin file parses and covers every SparkEntry query") {
    val pins = QueryBaseline.load(
      Paths.get("BENCH/QUERY_BASELINE.json"), "/root/testdata/sf0.1")
    assert(pins.nonEmpty, "committed QUERY_BASELINE.json must parse")
    val unpinned = SparkEntry.queries.keySet -- pins.keySet
    assert(unpinned.isEmpty,
      s"queries without a pinned baseline (pin them after first honest run): $unpinned")
    assert(pins.values.forall(_ > 0))
  }
}
