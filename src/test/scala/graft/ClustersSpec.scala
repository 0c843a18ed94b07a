package graft

import org.apache.spark.sql.functions._

import graft.dedup.Clusters

/** Connected-component cluster resolution (VERDICT r02 #1): pairs →
  * transitive closure → min-id survivor, distributed large-star/small-star.
  */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.resolveClusters(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  /** Driver-side union-find reference for randomized comparison. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("planted 3-chain resolves transitively: a-b, b-c => one cluster") {
    val out = resolve(Seq((1L, 2L), (2L, 3L)))
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("1000-node star (center NOT the min) resolves to the min leaf") {
    val edges = (1L to 1000L).filter(_ != 500L).map(i => (i, 500L))
    val out = resolve(edges)
    assert(out.size === 1000)
    assert(out.values.forall(_ == 1L), "every member must label to min id 1")
  }

  test("200-node path converges within the iteration bound") {
    val edges = (1L until 200L).map(i => (i, i + 1))
    val out = resolve(edges)
    assert(out.size === 200)
    assert(out.values.forall(_ == 1L))
  }

  test("duplicate, reversed and self edges are tolerated") {
    val out = resolve(Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 2L), (7L, 8L)))
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("randomized graphs match a reference union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter { case (a, b) => a != b }
      assert(resolve(edges) === unionFind(edges))
    }
  }

  test("non-convergence inside maxIter fails loudly, never silently partial") {
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Clusters.resolveClusters(edges, maxIter = 1).collect()
    }
  }

  test("resolveClusters composes with the simhash and embedding-cosine pair emitters") {
    // all emitters share the (id_a, id_b) contract, so closure composes
    val sameText = (0 until 30).map(j => s"dup$j").mkString(" ")
    val docs = Seq((0L, sameText), (100L, sameText), (200L, sameText),
      (1L, (0 until 30).map(j => s"other$j").mkString(" "))).toDF("doc_id", "text")
    val simClusters = Clusters.resolveClusters(
      graft.dedup.DocDedup.simhashPairs(docs, maxHamming = 0))
      .as[(Long, Long)].collect().toMap
    assert(simClusters === Map(0L -> 0L, 100L -> 0L, 200L -> 0L))
    val vecs = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)), (7L, Array(1.0f, 0f, 0f, 0f)),
      (9L, Array(1.0f, 0f, 0f, 0f)), (3L, Array(0f, 1.0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cosClusters = Clusters.resolveClusters(
      graft.ann.Ann.cosineNearDupPairs(vecs, threshold = 0.999))
      .as[(Long, Long)].collect().toMap
    assert(cosClusters === Map(0L -> 0L, 7L -> 0L, 9L -> 0L))
  }

  test("dedupCorpusFrom: one closure over mixed sources, each family source-EXCLUSIVE") {
    import graft.dedup.DocDedup
    import graft.ann.Ann
    // family M: docs 0/10/11 identical text (minhash finds; simhash too —
    // exact dups are every text generator's overlap)
    val same = (0 until 30).map(j => s"dup$j").mkString(" ")
    // family S: doc 21 = doc 1's tokens REVERSED — identical token bag
    // (simhash hamming 0) but near-disjoint 3-shingles (minhash blind)
    val t1 = (0 until 30).map(j => s"s$j").mkString(" ")
    val t1rev = (0 until 30).map(j => s"s$j").reverse.mkString(" ")
    // family E: doc 32 shares NO tokens with doc 2; only its planted
    // identical embedding connects it
    val t2 = (0 until 30).map(j => s"e$j").mkString(" ")
    val tNon = (0 until 30).map(j => s"zq$j").mkString(" ")
    val docs = Seq(
      (0L, same), (10L, same), (11L, same),
      (1L, t1), (21L, t1rev),
      (2L, t2), (32L, tNon)).toDF("doc_id", "text")
    val vecs = Seq(
      (2L, Array(0.3f, 0.9f, 0.1f, 0.5f)), (32L, Array(0.3f, 0.9f, 0.1f, 0.5f)),
      (0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(0f, 1.0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val minhash = DocDedup.minhashPairs(docs, threshold = 0.9)
    val simhash = DocDedup.simhashPairs(docs, maxHamming = 3)
    val cosine = Ann.cosineNearDupPairs(vecs, threshold = 0.999)
    // source exclusivity: minhash must NOT see the reversed pair…
    val mh = minhash.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!mh.contains((1L, 21L)), "token reversal must defeat shingle LSH")
    // …while simhash finds it with certainty (hamming 0)
    val sh = simhash.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sh.contains((1L, 21L)))
    // no text source sees the embedding family
    assert(!mh.contains((2L, 32L)) && !sh.contains((2L, 32L)))
    // ONE closure over all three sources resolves all families
    val out = Clusters.dedupCorpusFrom(docs, Seq(minhash, simhash, cosine))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out === Set(
      (0L, 0L, true), (10L, 0L, false), (11L, 0L, false),
      (1L, 1L, true), (21L, 1L, false),
      (2L, 2L, true), (32L, 2L, false)))
    // dropping a source disconnects exactly its family — the composition is
    // load-bearing, not decorative
    val noSim = Clusters.dedupCorpusFrom(docs, Seq(minhash, cosine))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(noSim.contains((21L, 21L, true)), "without simhash the reversed doc is a singleton")
    val noCos = Clusters.dedupCorpusFrom(docs, Seq(minhash, simhash))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(noCos.contains((32L, 32L, true)), "without cosine the nonsense doc is a singleton")
  }

  test("dedupCorpus: exact copies cluster with transitive closure; singletons keep") {
    // docs 0/100/200 identical (pairwise LSH pairs form a triangle — the
    // closure must collapse them into ONE cluster rooted at 0); 10 distinct
    // docs with disjoint vocabularies stay singletons
    val distinct = (1 until 11).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${i}x${(i * 31 + j * 7) % 97}t$j").mkString(" "))
    }
    val sameText = (0 until 30).map(j => s"dup$j").mkString(" ")
    val docs = (distinct ++ Seq((0L, sameText), (100L, sameText), (200L, sameText)))
      .toDF("doc_id", "text")
    val out = Clusters.dedupCorpus(docs, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().toSet
    val expected = (1 until 11).map(i => (i.toLong, i.toLong, true)).toSet ++
      Set((0L, 0L, true), (100L, 0L, false), (200L, 0L, false))
    assert(out === expected)
  }
}
