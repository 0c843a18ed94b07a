package graft

import graft.pipeline.{Budget, Mixture}

/** Token-budget data selection + mixture epoch planning. */
class BudgetSpec extends SparkSpec {
  import spark.implicits._

  test("budget selection keeps best-score docs until the budget is spent") {
    // scores: c(0.9, 10 tok) > a(0.5, 15) > b(0.3, 10); budget 25
    val docs = Seq((1L, 15L, 0.5), (2L, 10L, 0.3), (3L, 10L, 0.9))
      .toDF("id", "n_tokens", "score")
    val out = Budget.selectUnderTokenBudget(docs, budget = 25L)
      .select("id", "start_tok", "kept").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(3L) === ((0L, true)))
    assert(out(1L) === ((10L, true)), "10 + 15 = 25 fits exactly")
    assert(out(2L) === ((25L, false)), "the budget is spent")
  }

  test("score ties consume in id order; a straddling doc is dropped whole") {
    val docs = Seq((5L, 10L, 0.5), (3L, 10L, 0.5), (4L, 10L, 0.5))
      .toDF("id", "n_tokens", "score")
    val out = Budget.selectUnderTokenBudget(docs, budget = 25L)
      .select("id", "start_tok", "kept").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(3L) === ((0L, true)))
    assert(out(4L) === ((10L, true)))
    assert(out(5L) === ((20L, false)), "20 + 10 > 25: straddlers drop whole, never split")
  }

  test("budget 0 keeps nothing; budget >= total keeps everything") {
    val docs = Seq((1L, 5L, 0.1), (2L, 5L, 0.2)).toDF("id", "n_tokens", "score")
    assert(Budget.selectUnderTokenBudget(docs, 0L).filter($"kept").count() === 0L)
    assert(Budget.selectUnderTokenBudget(docs, 10L).filter($"kept").count() === 2L)
  }

  test("mixture plan: epochs > 1 for scarce sources, rate capped at 1") {
    // a: 100 tokens, b: 1000 tokens; weights 50/50; budget 400
    val docs = (Seq.fill(2)(("a", 50L)) ++ Seq.fill(4)(("b", 250L)))
      .toDF("source", "n_tokens")
    val out = Mixture.plan(docs, Map("a" -> 0.5, "b" -> 0.5), budget = 400L)
      .select("source", "target_tokens", "epochs", "sample_rate")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a")._2 === 200L)
    assert(out("a")._3 === 2.0, "a must repeat: 200 target over 100 held")
    assert(out("a")._4 === 1.0, "sample rate caps at 1 — repetition is the epochs column")
    assert(out("b")._3 === 0.2 && out("b")._4 === 0.2)
  }

  test("unlisted sources surface as planned=false with weight 0, never dropped") {
    val docs = Seq(("a", 10L), ("zzz", 10L)).toDF("source", "n_tokens")
    val out = Mixture.plan(docs, Map("a" -> 1.0), budget = 100L)
      .select("source", "planned", "weight", "target_tokens", "sample_rate")
      .as[(String, Boolean, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", true, 1.0, 100L, 1.0)))
    assert(out("zzz") === (("zzz", false, 0.0, 0L, 0.0)))
  }

  test("weights normalize: {a->2, b->6} plans as 25/75") {
    val docs = Seq(("a", 100L), ("b", 100L)).toDF("source", "n_tokens")
    val out = Mixture.plan(docs, Map("a" -> 2.0, "b" -> 6.0), budget = 1000L)
      .select("source", "weight", "target_tokens")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 0.25, 250L)))
    assert(out("b") === (("b", 0.75, 750L)))
  }
}
