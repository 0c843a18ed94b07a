package graft

import org.apache.spark.sql.SparkSession

/** Stage-isolation probe replicating the Bench crawl workload (guide §1)
  * with per-job reporting. Not a contract main; Bench stays the timing
  * authority.
  */
object ProbeCrawl {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime())
        descs.put(js.jobId, Option(js.properties)
          .flatMap(pp => Option(pp.getProperty("spark.job.description"))).getOrElse(""))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(starts.remove(je.jobId)).foreach { t0 =>
          val d = (System.nanoTime() - t0) / 1e9
          if (d > 0.15) println(f"[job] ${je.jobId}%4d $d%7.3f s  ${descs.getOrDefault(je.jobId, "")}")
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1e3)
          .getOrElse(-1.0)
        if (wall > 0.15)
          println(f"[stage] ${si.stageId}%4d $wall%7.3f s  tasks=${si.numTasks}%4d  ${si.name.take(110)}")
      }
    })
    val reps = if (args.nonEmpty) args(0).toInt else 2
    for (r <- 1 to reps) {
      val nUrls = 120000L
      val frontier = synth.BenchWorkload.frontier(spark, nUrls, 512, 100)
      val pages = synth.BenchWorkload.pages(frontier)
      val robots = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("host STRING, pathPrefix STRING, allow BOOLEAN"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-probe").toString
      val t0 = System.nanoTime()
      val (_, seen, _) = graft.crawl.CrawlJob.run(
        spark, frontier, pages, robots, ckpt,
        model.PolitenessConfig(maxGlobal = Int.MaxValue, maxPerHost = 20000),
        roundSec = 10000.0, maxRounds = 100)
      val n = seen.count()
      println(f"[crawl] rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n urls")
    }
    spark.stop()
  }
}
