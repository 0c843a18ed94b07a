package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny deterministic corpus: 3 clusters around orthogonal axes + noise. */
  private def corpus = {
    def vec(axis: Int, jitter: Int): Array[Float] = {
      val v = Array.fill(8)(0.05f * ((jitter * 7 + axis) % 3))
      v(axis) = 1.0f
      v(axis + 1) = 0.1f * jitter
      v
    }
    (0 until 30).map { i =>
      val axis = i % 3
      (i.toLong, vec(axis * 2, i / 3))
    }.toDF("vec_id", "embedding")
  }

  private def queries = Seq(
    (0L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (1L, Array(0f, 0f, 1.0f, 0f, 0f, 0f, 0f, 0f)))
    .toDF("query_id", "q_embedding")

  test("brute-force top-k matches a driver-side exact computation") {
    val got = Ann.bruteForceTopK(queries, corpus, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    // driver-side oracle
    val corp = corpus.as[(Long, Array[Float])].collect()
    val qs = queries.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    qs.foreach { case (qid, qv) =>
      val expect = corp.map { case (id, v) => (id, math.rint(cos(qv, v) * 1e6) / 1e6) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      assert(got(qid) === expect, s"query $qid")
    }
  }

  test("lsh top-k: self-query recall — nearest neighbor found in-bucket") {
    // query with an exact corpus vector: its bucket must contain itself
    val corp = corpus.as[(Long, Array[Float])].collect()
    val q = Seq((42L, corp(4)._2)).toDF("query_id", "q_embedding")
    val got = Ann.lshTopK(q, corpus, k = 3, bits = 8, tables = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    assert(got.minBy(_._4)._2 === corp(4)._1, "rank-1 must be the identical vector")
    assert(math.abs(got.minBy(_._4)._3 - 1.0) < 1e-6)
  }

  test("cosine near-dup pairs finds planted duplicate vectors") {
    val withDup = corpus.unionAll(
      corpus.filter(col("vec_id") === 7L).select(lit(999L).as("vec_id"), col("embedding")))
    val pairs = Ann.cosineNearDupPairs(withDup, threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 === 7L && p._2 === 999L && p._3 >= 0.999))
  }

  test("vector primitives: dot/norm/cosine column math") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val (d, na, c) = df.select(
      Ann.dot(col("a"), col("b")),
      Ann.l2Norm(col("a")),
      round(Ann.cosine(col("a"), col("b")), 4))
      .as[(Double, Double, Double)].head()
    assert(d === 24.0)
    assert(na === 5.0)
    assert(c === 0.96)
  }
}
