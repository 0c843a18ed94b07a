package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-level deduplication for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every method is shuffle-bounded by (band, bucket) or
  * (signature) keys — candidate generation never compares all pairs.
  * At 100 TB the expensive step is the self-join inside LSH buckets;
  * bucket sizes are capped (`maxBucket`) so a degenerate bucket (boilerplate
  * shingles) cannot produce a quadratic blowup — the cap is logged as a
  * dropped-coverage metric by callers, never silently.
  */
object DocDedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup: group by content hash, keep the lowest id. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  // ----------------------------------------------------------- shingles

  /** Word k-shingles (k consecutive lowercase tokens joined by " "). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => t =!= "")
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(
        sequence(lit(0), n - k),
        i => array_join(slice(toks, i + 1, lit(k)), " "))))
      .otherwise(array(array_join(toks, " ")))
  }

  // ------------------------------------------------------------ minhash

  /** MinHash signature: numHashes permutations approximated by seeded
    * xxhash64; signature[i] = min over shingles of xxhash64(shingle, i).
    */
  def minhashSignature(shingleArr: Column, numHashes: Int = 64): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleArr, s => xxhash64(s, lit(i))))
    }: _*)

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band → (band_idx, band_hash) bucket keys.
    */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(to_json(struct(slice(sig, b * rowsPerBand + 1, rowsPerBand).as("s")))).as("bucket"))
    }: _*)

  /** MinHash-LSH near-dup candidate pairs with estimated Jaccard ≥
    * `threshold`. Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    *
    * Pipeline: shingle → signature → explode bands → group by
    * (band, bucket) → self-pair within bucket (capped) → dedup pairs →
    * verify on signature agreement (the MinHash Jaccard estimate).
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = docs
      .select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"), col("sig"), explode(lshBuckets(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    // cap pathological buckets (boilerplate): keep the maxBucket lowest ids
    val w = Window.partitionBy("band", "bucket").orderBy("id")
    val capped = sigs.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= maxBucket).drop("__rn")
    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn(
        "est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes, 4))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by token
    * hash bit; sign → bit. Expressed as a Scala UDF over the token array
    * (bit-twiddling per token × 64 bits is cheaper in one tight loop than
    * 64 aggregate expressions).
    */
  val simhashUdf = udf((toks: Seq[String]) => {
    val counts = new Array[Int](64)
    toks.foreach { t =>
      var h = scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0xffffffffL
      h = h * 0x9e3779b97f4a7c15L // spread to 64 bits
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  })

  def simhash(text: Column): Column =
    simhashUdf(filter(split(lower(trim(text)), "\\s+"), t => t =!= ""))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxHamming`: block on 4 16-bit chunks
    * (pigeonhole: distance ≤ 3 ⇒ at least one chunk equal), self-join per
    * chunk, verify exact Hamming.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
      .withColumn("chunk", explode(array((0 until 4).map { c =>
        struct(lit(c).as("c"), shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))
      }: _*)))
    val a = sigs.select(col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ------------------------------------------------------- exact jaccard

  /** Exact n-gram Jaccard for candidate pairs (verification stage after
    * LSH): |A∩B| / |A∪B| over shingle sets.
    */
  def jaccard(shA: Column, shB: Column): Column =
    round(size(array_intersect(shA, shB)).cast("double") /
      greatest(size(array_union(shA, shB)), lit(1)), 4)

  /** LSH candidates verified with exact shingle Jaccard ≥ threshold. */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8): DataFrame = {
    val candidates = minhashPairs(docs, idCol, textCol, threshold = threshold * 0.8)
    val sh = docs.select(col(idCol).as("jid"), shingles(col(textCol)).as("jsh"))
    candidates
      .join(sh.withColumnRenamed("jid", "id_a").withColumnRenamed("jsh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("jid", "id_b").withColumnRenamed("jsh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
