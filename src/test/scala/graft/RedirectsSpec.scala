package graft

import graft.urls.Redirects

/** Redirect-chain resolution: chains, terminals, dangling targets,
  * cycles, determinism.
  */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  test("chains resolve to the terminal with exact hop counts; cycles flagged") {
    val pages = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a3", null),            // 2-hop chain
      ("b1", "b2"), ("b2", null),                          // 1-hop
      ("t", null),                                         // terminal
      ("d", "gone"),                                       // dangling target
      ("c1", "c2"), ("c2", "c1"),                          // 2-cycle
      ("e1", "e2"), ("e2", "e3"), ("e3", "e4"), ("e4", "e5"),
      ("e5", "e6"), ("e6", "e7"), ("e7", "e8"), ("e8", null) // 7-hop chain
    ).toDF("url", "redirect_to")
    val r = Redirects.resolve(pages, maxHops = 8)
      .as[(String, String, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("a1") === (("a3", 2L, false)))
    assert(r("a2") === (("a3", 1L, false)))
    assert(r("a3") === (("a3", 0L, false)))
    assert(r("b1") === (("b2", 1L, false)))
    assert(r("t") === (("t", 0L, false)))
    assert(r("d") === (("gone", 1L, false)), "dangling target is a valid terminal")
    assert(r("e1") === (("e8", 7L, false)))
    assert(r("c1")._2 === 8L)
    assert(r("c1")._3 === true, "cycle must report looped, not hang or drop")
    assert(r("c2")._3 === true)
  }

  test("resolution is deterministic across partitionings") {
    val pages = (1 to 300).map { i =>
      val hop = i % 4
      if (hop == 0) (s"p$i", null) else (s"p$i", s"p${i - 1}")
    }.toDF("url", "redirect_to")
    val r1 = Redirects.resolve(pages.repartition(1))
      .as[(String, String, Long, Boolean)].collect().toSet
    val r16 = Redirects.resolve(pages.repartition(16))
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(r1 === r16)
  }
}
