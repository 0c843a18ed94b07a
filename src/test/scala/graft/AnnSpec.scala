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

  test("ivf: full-probe equals brute force exactly; training is deterministic") {
    // nProbe = nLists probes every list => candidate set = full corpus =>
    // results must be IDENTICAL to the exact baseline
    val exact = Ann.bruteForceTopK(queries, corpus, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val full = Ann.ivfTopK(queries, corpus, k = 5, nLists = 4, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full === exact)
    val c1 = Ann.ivfCentroids(corpus, nLists = 4)
    val c2 = Ann.ivfCentroids(corpus, nLists = 4)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
  }

  test("ivf: self-query lands in its own list at any nProbe; clustered recall") {
    val corp = corpus.as[(Long, Array[Float])].collect()
    val q = Seq((42L, corp(4)._2)).toDF("query_id", "q_embedding")
    val got = Ann.ivfTopK(q, corpus, k = 3, nLists = 4, nProbe = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    assert(got.minBy(_._4)._2 === corp(4)._1, "rank-1 must be the identical vector")
    assert(math.abs(got.minBy(_._4)._3 - 1.0) < 1e-6)
    // clustered corpus, nProbe=2 of 4: the probed lists must cover the
    // query's axis cluster — rank-1 of the axis queries is an axis member
    val axisTop = Ann.ivfTopK(queries, corpus, k = 1, nLists = 4, nProbe = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(axisTop.length === 2)
    axisTop.foreach { case (qid, vid, cos, _) =>
      assert(cos > 0.9, s"query $qid top hit $vid (cos $cos) not from its cluster")
    }
  }

  test("ivf: PRODUCTION shape (nProbe << nLists) — trained-model recall floor vs brute force") {
    // the deployed configuration (q45's comment explains why this half —
    // TRAINED centroids at partial probe — is spec-gated rather than
    // DuckDB-gated: Lloyd's has no SQL dual). 200 deterministic vectors
    // with mild cluster structure; training is deterministic, so the
    // recall is an exact property of this corpus, asserted as a floor.
    val big = (0 until 200).map { i =>
      val v = Array.tabulate(8)(d => ((((i * 31 + d * 17) % 29) - 14) / 14.0f))
      v(i % 8) += 2.0f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val qs = big.filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val cents = Ann.ivfCentroids(big, nLists = 16)
    val ivf = Ann.ivfTopK(qs, big, k = 5, nLists = 16, nProbe = 4, centroids = Some(cents))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val bf = Ann.bruteForceTopK(qs, big, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(bf.size === 30) // 6 queries x k=5
    val recall = bf.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.6, s"production-shape (16 lists / 4 probes) recall@5 too low: $recall")
  }

  test("ivf: more lists than distinct vectors — empty lists keep centroids, search still works") {
    val tiny = corpus.limit(3)
    val cents = Ann.ivfCentroids(tiny, nLists = 8, trainSample = 100)
    assert(cents.length <= 8 && cents.nonEmpty)
    val q = Seq((0L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("query_id", "q_embedding")
    val got = Ann.ivfTopK(q, tiny, k = 2, nLists = cents.length, nProbe = cents.length,
      centroids = Some(cents))
    assert(got.count() >= 1)
  }

  test("ivf model persistence: persisted centroids == retrained, atomic beside other tables") {
    import graft.checkpoint.SnapshotStore
    val store = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("ann-store").toString)
    // a prior snapshot with an unrelated table — the model must commit
    // BESIDE it, not clobber the snapshot's other state
    store.commit(1, Map("rates" -> "/data/rates/v1"))
    val trained = Ann.ivfCentroids(corpus, nLists = 4)
    val v = Ann.saveCentroids(trained, store, spark)
    assert(v === 2)
    val loaded = Ann.loadCentroids(store, spark)
    // determinism makes the round-trip EXACT (bit-for-bit), so persisted
    // and retrained models are interchangeable
    assert(loaded.map(_.toSeq).toSeq === trained.map(_.toSeq).toSeq)
    assert(store.readManifest(2).get("rates").contains("/data/rates/v1"))
    // the production search path: load instead of retrain — identical
    // results to the ad-hoc-trained call
    val viaLoaded = Ann.ivfTopK(queries, corpus, k = 5, nLists = 4, nProbe = 4,
      centroids = Some(loaded)).as[(Long, Long, Double, Int)].collect().toSet
    val viaTrained = Ann.ivfTopK(queries, corpus, k = 5, nLists = 4, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(viaLoaded === viaTrained)
    // missing model fails loudly, never silently retrains
    val empty = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("ann-store-empty").toString)
    intercept[IllegalStateException] { Ann.loadCentroids(empty, spark) }
    empty.commit(1, Map("other" -> "/x"))
    intercept[IllegalStateException] { Ann.loadCentroids(empty, spark) }
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
