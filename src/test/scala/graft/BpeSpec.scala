package graft

import graft.pipeline.BpeVocab

/** BPE vocabulary induction: the Sennrich et al. running example worked by
  * hand (merge order incl. the lexicographic tie-breaks), the GPT-2-style
  * encode loop, roundtrip/determinism properties, model persistence, and
  * the distributed word-count + encode paths against local equivalents.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich's corpus: low:5 lower:2 newest:6 widest:3. Hand-derived:
  //   pair counts: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 (n,e)=6 (e,w)=6
  //   merge 1 = (e,s)   — 9, tie with (s,t), "e" < "s"
  //   merge 2 = (es,t)  — 9
  //   merge 3 = (l,o)   — 7, tie with (o,w), "l" < "o"
  //   merge 4 = (lo,w)  — 7
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainMerges reproduces the hand-worked Sennrich merge order") {
    val m = BpeVocab.trainMerges(sennrich, 4)
    assert(m === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("training exhausts: merge count stops when every word is one symbol") {
    val m = BpeVocab.trainMerges(Seq(("ab", 1L)), 10)
    assert(m === Seq(("a", "b"))) // then no pairs remain
  }

  test("input order never changes the merges (selection is a total order)") {
    assert(BpeVocab.trainMerges(sennrich.reverse, 4) ===
      BpeVocab.trainMerges(sennrich, 4))
  }

  test("encodeWord: the classic lowest unseen word segments as low + est") {
    val ranks = BpeVocab.trainMerges(sennrich, 4).zipWithIndex.toMap
    assert(BpeVocab.encodeWord("lowest", ranks) === Vector("low", "est"))
    // fully out-of-vocabulary text stays at the character level
    assert(BpeVocab.encodeWord("zq", ranks) === Vector("z", "q"))
    // single symbol needs no loop
    assert(BpeVocab.encodeWord("a", ranks) === Vector("a"))
  }

  test("encode roundtrip: subwords always concatenate back to the word") {
    val ranks = BpeVocab.trainMerges(sennrich, 4).zipWithIndex.toMap
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "slowest", "xyzzy"))
      assert(BpeVocab.encodeWord(w, ranks).mkString === w, s"roundtrip of $w")
  }

  test("surrogate pairs are symbols, never split") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(BpeVocab.encodeWord(s"a${emoji}b", Map.empty) ===
      Vector("a", emoji, "b"))
    val m = BpeVocab.trainMerges(Seq((s"$emoji$emoji", 3L)), 1)
    assert(m === Seq((emoji, emoji)))
  }

  test("wordCounts: distributed counts match a local count; top-V cap is total-ordered") {
    val docs = Seq((1L, "b a b C c"), (2L, "a b A")).toDF("doc_id", "text")
    val all = BpeVocab.wordCounts(docs).as[(String, Long)].collect().toMap
    assert(all === Map("a" -> 3L, "b" -> 3L, "c" -> 2L))
    // cap 2 under the a/b tie: lexicographic word order decides
    val top = BpeVocab.wordCounts(docs, maxWords = 2)
      .as[(String, Long)].collect().toSet
    assert(top === Set(("a", 3L), ("b", 3L)))
  }

  test("train(df) over wordCounts == trainMerges over the same pairs") {
    val docs = sennrich.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val viaDf = BpeVocab.train(BpeVocab.wordCounts(docs), 4)
    assert(viaDf === BpeVocab.trainMerges(sennrich, 4))
  }

  test("distributed encode == local encodeWord per token; counts consistent") {
    val merges = BpeVocab.trainMerges(sennrich, 4)
    val ranks = merges.zipWithIndex.toMap
    val docs = Seq((1L, "Lowest newest zq"), (2L, "")).toDF("doc_id", "text")
    val out = BpeVocab.encode(docs, merges)
      .orderBy("id").as[(Long, Long, Seq[String], Long)].collect()
    val expected1 = Seq("lowest", "newest", "zq")
      .flatMap(w => BpeVocab.encodeWord(w, ranks))
    assert(out(0) === ((1L, 3L, expected1, expected1.size.toLong)))
    assert(out(1) === ((2L, 0L, Seq.empty[String], 0L)))
  }

  test("save/load roundtrips the ordered merge table") {
    val merges = BpeVocab.trainMerges(sennrich, 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe-spec").toString
    BpeVocab.saveMerges(spark, merges, s"$dir/merges")
    assert(BpeVocab.loadMerges(spark, s"$dir/merges") === merges)
  }
}
