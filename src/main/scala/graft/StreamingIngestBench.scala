package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Throughput evidence for the STREAMING corpus-ingest path (VERDICT r05
  * #8): `Streams.corpusIngest` is kill-and-resume/exactly-once SPEC-proven;
  * this measures it — docs/s through the full micro-batch chain (verdict
  * kernels → watermark dedup → history anti-join → snapshot append +
  * atomic commit) across several waves, against the batch `Corpus.clean`
  * rate over the SAME corpus in the same session.
  *
  * Wave shape: each wave is one file moved into the watched directory and
  * drained with `processAllAvailable` — one micro-batch per wave, with the
  * accumulated store growing underneath, so the per-wave walls also
  * evidence the bounded history cost (the persisted `__h` column keeps the
  * anti-join's build side at 16 bytes/doc — re-hashing history text each
  * batch was the round-6 ADVICE fix). Wave timestamps advance by 3 h
  * against the 1 h watermark, so in-flight dedup state is evicted between
  * waves, as in a real arrival timeline.
  *
  * Comparison contract, stated honestly: the batch side runs the same
  * verdict chain and an exact-dup window plus one parquet write — it has
  * no history anti-join or commit protocol, so the ratio reported is
  * "streaming overhead over the closest batch equivalent", not a
  * same-work A/B.
  *
  * Protocol: same fresh-JVM best-of discipline as the other scaling
  * benches (`runMain graft.StreamingIngestBench` appends to
  * BENCH/streaming_ingest_runs.tsv; this VM's steal noise makes single
  * runs indicative, best-of citable).
  */
object StreamingIngestBench {

  /** 64-word alphabetic vocabulary, 8 English stopwords among it, so the
    * generated docs PASS the verdict chain (lang=en, quality bands) and the
    * append path actually runs — `BenchWorkload.docs`' `w<hash>` tokens all
    * fail the language filter, which would measure only the drop path (and
    * its generator fingerprint is pinned by the dedup tsv, so it must not
    * change). ~`dupPermille`/1000 of docs sit in exact-duplicate families
    * of 3, exercising both dedup layers.
    */
  private val Vocab: Seq[String] =
    Seq("the", "and", "of", "to", "in", "is", "it", "for") ++
      Seq("apple", "river", "stone", "cloud", "forest", "window", "garden", "mountain",
        "paper", "bridge", "candle", "flower", "market", "silver", "shadow", "spring",
        "winter", "summer", "autumn", "morning", "evening", "harbor", "island", "valley",
        "meadow", "thunder", "whisper", "journey", "lantern", "mirror", "orchard", "pebble",
        "quiver", "ribbon", "saddle", "timber", "tunnel", "velvet", "wagon", "yonder",
        "zephyr", "anchor", "basket", "cellar", "dagger", "ember", "falcon", "goblet",
        "hammer", "ivory", "jacket", "kettle", "ladder", "magnet", "needle", "oyster")

  /** Deterministic ingest corpus: 40-token docs over [[Vocab]]. */
  def ingestDocs(spark: SparkSession, nDocs: Long, dupPermille: Int = 100): DataFrame = {
    val ids = spark.range(nDocs).toDF("doc_id")
    val famBase = col("doc_id") - pmod(col("doc_id"), lit(3L))
    val isDup = pmod(xxhash64(famBase, lit("dupfam")), lit(1000L)) < dupPermille
    val seed = when(isDup, famBase).otherwise(col("doc_id"))
    val vocab = array(Vocab.map(lit): _*)
    ids.withColumn("text",
      concat_ws(" ", transform(sequence(lit(0), lit(39)),
        j => element_at(vocab, (pmod(xxhash64(seed, j, lit("tok")), lit(Vocab.size.toLong)) + 1).cast("int")))))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val waves = sys.env.getOrElse("SPARK_GRAFT_BENCH_WAVES", "5").toInt
    val docsPerWave = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS_PER_WAVE", "100000").toLong
    val nDocs = waves * docsPerWave
    val tmp = sys.env.getOrElse("SPARK_GRAFT_BENCH_TMPDIR", "/tmp")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-streaming-ingest-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", tmp)
      .config("spark.sql.warehouse.dir", s"$tmp/warehouse-ingest-$cpus")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val root = Files.createTempDirectory(Paths.get(tmp), "graft-ingest-bench")
      val staging = root.resolve("staging")
      val watch = root.resolve("watch")
      val ckpt = root.resolve("ckpt").toString
      val store = root.resolve("store").toString
      Files.createDirectories(watch)
      // pre-generate every wave's JSON-lines file OUTSIDE the measured
      // window; wave w's timestamps sit 3 h after wave w-1's (watermark 1 h)
      val all = ingestDocs(spark, nDocs).cache()
      all.count()
      for (w <- 0 until waves) {
        val lo = w * docsPerWave
        val df = all.filter(col("doc_id") >= lo && col("doc_id") < lo + docsPerWave)
          .select(to_json(struct(
            timestamp_seconds(lit(1700000000L + w * 10800L)).as("ts"),
            col("doc_id"), col("text"))).as("value"))
        df.coalesce(1).write.mode("overwrite").text(staging.resolve(s"wave$w").toString)
      }
      // ---- streaming leg: one micro-batch per wave against a growing store
      val q = graft.streaming.Streams.corpusIngest(spark, watch.toString, ckpt, store)
      val waveWalls = new Array[Double](waves)
      val t0 = System.nanoTime()
      for (w <- 0 until waves) {
        val part = Files.list(staging.resolve(s"wave$w")).iterator()
        var src: java.nio.file.Path = null
        while (part.hasNext) { val p = part.next(); if (p.toString.endsWith(".txt")) src = p }
        val tw = System.nanoTime()
        Files.move(src, watch.resolve(s"wave$w.json"), StandardCopyOption.ATOMIC_MOVE)
        q.processAllAvailable()
        waveWalls(w) = (System.nanoTime() - tw) / 1e9
      }
      val streamWall = (System.nanoTime() - t0) / 1e9
      q.stop()
      val snap = new graft.checkpoint.SnapshotStore(store).readCurrent()
      val corpusPaths = snap.get._2("corpus").split(";").filter(_.nonEmpty).toIndexedSeq
      val stored = spark.read.parquet(corpusPaths: _*).count()
      // ---- batch leg: the closest batch equivalent over the same corpus
      val tb = System.nanoTime()
      graft.pipeline.Corpus.clean(all)
        .filter(col("keep"))
        .write.mode("overwrite").parquet(root.resolve("batch_out").toString)
      val batchWall = (System.nanoTime() - tb) / 1e9
      all.unpersist()
      val streamThr = nDocs / streamWall
      val batchThr = nDocs / batchWall
      def f1(d: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
      Files.createDirectories(Paths.get("BENCH"))
      Files.writeString(Paths.get("BENCH/streaming_ingest_runs.tsv"),
        String.format(java.util.Locale.ROOT, "%d\t%d\t%d\t%.1f\t%.0f\t%.1f\t%.0f\t%s%n",
          Int.box(cpus), Int.box(waves), Long.box(docsPerWave),
          Double.box(streamWall), Double.box(streamThr),
          Double.box(batchWall), Double.box(batchThr),
          waveWalls.map(f1).mkString(",")),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      println(
        s"""{"metric":"streaming_ingest_docs_per_sec","cpus":$cpus,"waves":$waves,""" +
          s""""docs":$nDocs,"stored_survivors":$stored,""" +
          s""""stream_wall_sec":${f1(streamWall)},"stream_docs_per_sec":${streamThr.round},""" +
          s""""batch_wall_sec":${f1(batchWall)},"batch_docs_per_sec":${batchThr.round},""" +
          s""""stream_over_batch":${f1(streamWall / batchWall)},""" +
          s""""wave_walls_sec":[${waveWalls.map(f1).mkString(",")}]}""")
    } finally spark.stop()
  }
}
