package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** BPE tokenizer vocabulary induction (Sennrich et al. 2016) — the
  * pretraining step that learns a subword merge table from the corpus the
  * model will train on. The industry shape (HuggingFace `tokenizers`,
  * SentencePiece) is exactly two phases, and the split matters at 100 TB:
  *
  *   1. CORPUS-SCALE: count word frequencies — one distributed scan with
  *      map-side partial aggregation, optionally capped to the top-V words
  *      ([[wordCounts]]; the cap is a distributed per-partition top-V +
  *      model-sized driver merge, the standard tokenizer-training input).
  *      This phase is gated cross-engine by q58.
  *   2. MODEL-SIZED: the merge loop runs over the (word, freq) table —
  *      V rows, NOT the corpus — so it is driver-side by design, the
  *      [[graft.ann.Ann]] centroid-training precedent ([[trainMerges]]).
  *      Deterministic: the best pair is max count, ties to the
  *      lexicographically smallest pair, so the same corpus always yields
  *      the same merge table on any cluster.
  *
  * Encoding ([[encode]]) applies the learned ranks per word — the GPT-2
  * `bpe()` algorithm: repeatedly merge the lowest-rank adjacent pair —
  * as a row-local kernel over a broadcast rank map; no shuffle, no state.
  * Symbols are full Unicode code points (surrogate pairs never split).
  */
object BpeVocab {

  /** Corpus-global word-frequency table over lowercased whitespace tokens
    * — the distributed phase. `maxWords > 0` caps to the top-V by
    * (freq desc, word): a total order, so the cut is deterministic even
    * through frequency ties at the boundary.
    */
  def wordCounts(docs: DataFrame, textCol: String = "text",
      maxWords: Int = 0): DataFrame = {
    val base = docs
      .select(explode(TextFns.loweredTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    if (maxWords <= 0) base
    else base.orderBy(col("freq").desc, col("word")).limit(maxWords)
  }

  private def toSymbols(word: String): Vector[String] =
    word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector

  /** Merge every non-overlapping occurrence of `pair` left-to-right —
    * the one replacement rule both training and encoding share.
    */
  private[pipeline] def mergePair(
      s: Vector[String], pair: (String, String)): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == pair._1 && s(i + 1) == pair._2) {
        buf += s(i) + s(i + 1); i += 2
      } else { buf += s(i); i += 1 }
    }
    buf.result()
  }

  /** The classic merge loop over an in-memory (word, freq) table: count
    * adjacent symbol pairs weighted by word frequency, merge the best
    * (max count, ties to the lexicographically smallest pair), repeat.
    * Stops early when no pairs remain (every word fully merged). Exact
    * long arithmetic; input order never matters (selection is a total
    * order over (count, pair)).
    */
  def trainMerges(
      wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    var seqs: Vector[(Vector[String], Long)] =
      wordFreqs.map { case (w, f) => (toSymbols(w), f) }.toVector
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((s, f) <- seqs; i <- 0 until s.length - 1) {
        val p = (s(i), s(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        seqs = seqs.map { case (s, f) => (mergePair(s, best), f) }
      }
    }
    out.toSeq
  }

  /** Train from a [[wordCounts]] frame: collects the MODEL-sized word
    * table (cap it with `maxWords` upstream — the corpus never reaches the
    * driver) and runs [[trainMerges]].
    */
  def train(wordCounts: DataFrame, numMerges: Int): Seq[(String, String)] =
    trainMerges(
      wordCounts.select(col("word"), col("freq").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      numMerges)

  /** Persist a merge table as ordered (rank, left, right) parquet — the
    * [[graft.ann.Ann.saveCentroids]] model-artifact contract.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).select("rank", "left", "right")
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq

  /** GPT-2 `bpe()`: repeatedly merge the LOWEST-RANK adjacent pair until
    * none of the word's pairs has a rank. Deterministic for any rank map.
    */
  def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var s = toSymbols(word)
    var more = s.length > 1
    while (more) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (s(i), s(i + 1)) }
        i += 1
      }
      if (best == null) more = false
      else { s = mergePair(s, best); more = s.length > 1 }
    }
    s
  }

  /** Distributed encode: every doc's lowercased tokens → the concatenated
    * subword stream under `merges`, plus counts. Row-local — the rank map
    * is model-sized (numMerges entries) and rides the task closure; no
    * shuffle, no state, trivially 100 TB-safe. (A per-row kernel over a
    * small broadcast model is the UDF case the engine's functions-first
    * rule allows — the iterative lowest-rank loop has no Column form.)
    */
  def encode(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val enc = udf { tk: Seq[String] =>
      tk.flatMap(w => encodeWord(w, ranks))
    }
    docs
      .select(col(idCol).cast("long").as("id"),
        TextFns.loweredTokens(col(textCol)).as("__tk"))
      .select(col("id"), size(col("__tk")).cast("long").as("n_words"),
        enc(col("__tk")).as("subwords"))
      .withColumn("n_subwords", size(col("subwords")).cast("long"))
  }
}
