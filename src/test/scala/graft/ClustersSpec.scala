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
