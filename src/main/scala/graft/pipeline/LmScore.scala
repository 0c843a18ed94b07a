package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** N-gram language-model quality scoring — the CCNet/KenLM-style step
  * (Wenzek et al. 2020) that scores every document by its cross-entropy
  * under a reference language model, so a pipeline can keep the
  * well-formed "head" of the distribution and drop gibberish. Real CCNet
  * uses a 5-gram KenLM; this operator is the same pipeline shape with an
  * add-one-smoothed bigram model whose training AND scoring are exact
  * integer/log arithmetic — which is what lets the q55 DuckDB oracle
  * recompute the entire model and every score from scratch.
  *
  * Model definition (BOS-augmented, one table): with tk' = BOS :: tokens
  * (lowercased whitespace tokens, BOS = ''),
  *   - c2(p, w)  = count of consecutive pairs (p, w) of tk' over the
  *     reference corpus — THE model table, slim (p, w, c2)
  *   - cp(p)     = Σ_w c2(p, w) — derived from the model, never a second
  *     corpus scan
  *   - V         = |distinct w in c2| — every reference token occurs as
  *     some pair's `w`, so this IS the vocabulary size
  *   - logp(w|p) = ln((c2(p,w) + 1) / (cp(p) + V))   [add-one smoothing;
  *     unseen p ⇒ cp = 0 ⇒ uniform ln(1/V)]
  *   - xent(doc) = −Σ logp / n_tokens, 0.0 for empty docs
  */
object LmScore {

  /** BOS sentinel — the EMPTY string, which the whitespace tokenizer can
    * never emit (empty tokens are filtered in both engines), so no
    * document content, hostile or otherwise, can collide with it.
    */
  val Bos = ""

  /** (p, w) consecutive pairs of the BOS-augmented token array.
    * `tk` MUST be a materialized column (projection boundary), not an
    * inline tokenizer tree — every slice references it (SPARK-35410).
    */
  private def bigramPairs(tk: Column): Column = {
    val aug = array_prepend(tk, lit(Bos))
    val n = size(aug)
    when(n > 1,
      arrays_zip(slice(aug, lit(1), n - 1).as("p"), slice(aug, lit(2), n - 1).as("w")))
      .otherwise(typedLit(Array.empty[(String, String)]).cast("array<struct<p:string,w:string>>"))
  }

  /** Train the bigram count model over `refDocs`: one scan, one keyed
    * aggregation, slim (p, w, c2) out. The result is a MODEL table —
    * persist it (parquet) and feed [[scoreWith]] for production reuse, the
    * [[graft.ann.Ann.saveCentroids]] precedent. [[crossEntropy]] does the
    * equivalent automatically: [[scoreWith]] references the model three
    * times (the pair join, the prefix sums, the vocabulary size), and a
    * lazily-composed model would re-run this reference-corpus scan per
    * reference (lambda-heavy token subtrees defeat exchange reuse — the
    * documented Clusters trap), so the composition parquet-checkpoints the
    * slim model to scratch first.
    */
  def trainCounts(refDocs: DataFrame, textCol: String = "text"): DataFrame =
    // spread first (the featureBuckets/clean precedent): the tokenize +
    // pair-explode map side otherwise runs at raw scan parallelism
    graft.util.Par.spread(refDocs)
      .select(TextFns.loweredTokens(col(textCol)).as("__tk"))
      .select(explode(bigramPairs(col("__tk"))).as("__pc"))
      .groupBy(col("__pc.p").as("p"), col("__pc.w").as("w"))
      .agg(count(lit(1)).as("c2"))

  /** Score `docs` against a trained (p, w, c2) model table.
    *
    * Scale shape: the doc side is ONE projection + explode into a slim
    * (id, p, w) stream — the fat token array never crosses a shuffle. The
    * model joins are plain equi-joins (AQE broadcasts them while the model
    * fits, and degrades to shuffle joins when a deployment's model
    * doesn't — no hint pins the wrong strategy); cp and V are model-sized
    * aggregates. Per-doc reduction is a keyed agg on id — partial
    * (map-side) combine applies. No window, no driver data path.
    */
  def scoreWith(
      docs: DataFrame,
      model: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cp = model.groupBy("p").agg(sum("c2").as("__cp"))
    val vt = model.agg(count_distinct(col("w")).as("__v"))
    val ids = docs.select(col(idCol).cast("long").as("id"))
    val rows = graft.util.Par.spread(docs)
      .select(col(idCol).cast("long").as("id"),
        TextFns.loweredTokens(col(textCol)).as("__tk"))
      .select(col("id"), explode(bigramPairs(col("__tk"))).as("__pc"))
      .select(col("id"), col("__pc.p").as("p"), col("__pc.w").as("w"))
    val scored = rows
      .join(model, Seq("p", "w"), "left")
      .join(cp, Seq("p"), "left")
      .crossJoin(broadcast(vt))
      .select(col("id"),
        log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("__cp"), lit(0L)) + col("__v"))).as("__lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(col("__lp")) / count(lit(1)), 4).as("xent"))
    ids.join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("xent"), lit(0.0)).as("xent"))
  }

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2020 §4.3):
    * split each language's documents into `nBuckets` equal score bands —
    * head = lowest cross-entropy (most target-like), tail = highest — so a
    * pipeline can keep the head, sample the middle and drop the tail.
    * Generic over any (id, group, score) frame; feed it [[scoreWith]]
    * output for the published recipe.
    *
    * Bucketing rule (exact integer arithmetic, no float thresholds — what
    * lets the q59 DuckDB oracle recompute every verdict): with r = count
    * of same-group docs with STRICTLY smaller score and n = group size,
    *   bucket = (nBuckets * r) DIV n ∈ [0, nBuckets−1]
    * Ties share r and therefore a bucket (equal-perplexity docs never
    * straddle a boundary — and no per-doc tie-break order is needed, which
    * is what keeps the shape scalable).
    *
    * Scale shape: the per-doc work is one keyed histogram aggregation
    * (partial combine), one equi-join back on (group, score) and a
    * row-local DIV — never an ntile/row_number window over the documents
    * (one task per language at 10^10 docs). The only window runs over the
    * HISTOGRAM — distinct (group, score) pairs, ≤ ~2·10^5 per group when
    * scores are round(4) cross-entropies in [0, 20] — the same documented
    * bounded-intermediate contract as `maxBucket`. A score column with
    * unbounded distinct values (raw unrounded doubles) degrades the
    * histogram toward corpus size — round scores first, as [[scoreWith]]
    * already does.
    */
  def perplexityBuckets(
      scored: DataFrame,
      nBuckets: Int = 3,
      groupCol: String = "lang",
      scoreCol: String = "xent"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    // materialize the scored frame ONCE (r07): it has two structural
    // consumers (the histogram and the final per-doc join), and the
    // lambda-heavy tokenizer subtrees upstream defeat exchange-reuse
    // canonicalization, so a lazily-shared scoring chain executed per
    // consumer (measured 3× on q59 with the old separate totals
    // aggregate). Lazy checkpoint: the first consuming job computes the
    // RDD, every other consumer reads the blocks. Rows are slim by
    // construction — (id, group, rounded score) — the signature-table
    // storage contract.
    val s0 = scored.localCheckpoint(eager = false)
    val hist = s0.groupBy(groupCol, scoreCol).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCol).orderBy(scoreCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = hist
      .withColumn("__r", coalesce(sum(col("__c")).over(w), lit(0L)))
      .drop("__c")
    // group totals fold the HISTOGRAM, not the corpus: Σ__c per group ≡
    // count per group, over ≤ distinct-(group, score) rows — and the
    // duplicated hist subtree is now canonicalizable (it reads the
    // checkpointed RDD, no lambdas), so its exchange is reused between
    // this and the window branch instead of re-aggregating
    val totals = hist.groupBy(groupCol).agg(sum(col("__c")).as("__n"))
    s0
      .join(pre, Seq(groupCol, scoreCol))
      .join(totals, Seq(groupCol))
      .withColumn("bucket", expr(s"($nBuckets * __r) DIV __n"))
      .withColumn("bucket_label",
        when(col("bucket") === 0, "head")
          .when(col("bucket") === nBuckets - 1, "tail")
          .otherwise("middle"))
      .drop("__r", "__n")
  }

  /** One-call train-then-score composition (the q55 gate shape). The
    * trained model is parquet-checkpointed to `workDir` (or an auto-created
    * scratch removed best-effort at JVM exit — the
    * [[graft.dedup.Clusters.resolveClusters]] lifetime contract) so the
    * reference corpus is tokenized and aggregated EXACTLY once; the three
    * model references in [[scoreWith]] then read the slim column-pruned
    * parquet instead of re-running the training scan.
    */
  def crossEntropy(
      docs: DataFrame,
      refDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      refTextCol: String = "text",
      workDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    val hadoopConf = spark.sessionState.newHadoopConf()
    val scratch = workDir.getOrElse {
      val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
      graft.dedup.Clusters.registerScratchCleanup(hadoopConf, dir)
      dir
    }
    val modelPath = s"$scratch/model"
    trainCounts(refDocs, refTextCol).write.mode("overwrite").parquet(modelPath)
    scoreWith(docs, spark.read.parquet(modelPath), idCol, textCol)
  }
}
