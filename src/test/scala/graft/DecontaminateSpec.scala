package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Decontaminate

/** Benchmark decontamination: n-gram overlap flags, case folding, short-doc
  * immunity, verdict-not-filter contract.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags exactly the docs sharing an n-gram; case-folded; short docs immune") {
    val bench = Seq(
      "What is the capital of France and when was it founded exactly",
      "tiny").toDF("text")
    val docs = Seq(
      // contains the bench 8-gram "what is the capital of france and when" (case-folded)
      (1L, "Quiz leak: What Is The Capital Of France And When was it built"),
      (2L, "totally unrelated prose about crawling the web at scale today"),
      // shares 7 consecutive tokens only -> NOT contaminated at n=8
      (3L, "is the capital of france and when zzz yyy xxx www vvv"),
      (4L, "tiny"), // shorter than n -> no grams -> immune
      (5L, "")).toDF("doc_id", "text")
    val out = Decontaminate.contaminationFlags(docs, bench).orderBy("id")
      .as[(Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, true), (2L, false), (3L, false), (4L, false), (5L, false)))
  }

  test("n is a parameter: the 7-token overlap flags at n=7") {
    val bench = Seq("a b c d e f g h i j").toDF("text")
    val docs = Seq((1L, "x a b c d e f g y"), (2L, "x a b c d e f y"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminationFlags(docs, bench, n = 7).orderBy("id")
      .as[(Long, Boolean)].collect().toSeq
    assert(out === Seq((1L, true), (2L, false)))
  }
}
