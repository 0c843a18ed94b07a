package graft

import org.apache.spark.sql.functions._

import graft.util.Par

class ParSpec extends SparkSpec {
  import spark.implicits._

  test("spread raises scan-shaped inputs to defaultParallelism") {
    val p = spark.sparkContext.defaultParallelism
    val tiny = spark.range(10).toDF("id").repartition(1)
    // repartition is not scan-shaped; persist through a scan to model the
    // few-splits parquet case
    val dir = java.nio.file.Files.createTempDirectory("par-spec").toString
    tiny.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(scan.rdd.getNumPartitions < p)
    assert(Par.spread(scan).rdd.getNumPartitions === p)
    // narrow wrappers (select/filter/union) keep the spread guard active —
    // q27 passes scan UNION planted-rows and must still get kernel
    // parallelism
    val wrapped = scan.select(col("id")).filter(col("id") >= 0)
      .unionByName(Seq(100L).toDF("id"))
    assert(Par.spread(wrapped).rdd.getNumPartitions === p)
  }

  test("spread widens limit/sample/coalesce-shaped frames without probing them") {
    val p = spark.sparkContext.defaultParallelism
    // a non-terminal limit plans a single-partition exchange — probing it
    // with .rdd would execute that shuffle; spread must recognize the
    // shape statically and repartition for the kernel
    val limited = spark.range(1000).toDF("id").limit(500)
    assert(Par.spread(limited).rdd.getNumPartitions === p)
    val coalesced = spark.range(1000).toDF("id").coalesce(1)
    assert(Par.spread(coalesced).rdd.getNumPartitions === p)
    val sampled = spark.range(1000).toDF("id").sample(0.5, seed = 7)
      .select(col("id")).filter(col("id") >= 0)
    assert(Par.spread(sampled).rdd.getNumPartitions === p)
    // an already-wide explicit repartition is left alone
    val wide = spark.range(1000).toDF("id").repartition(p + 4)
    assert(Par.spread(wide) eq wide)
    // sample is NARROW — over a wide child it keeps the width and must not
    // be collapsed to p by an unconditional repartition
    val wideSample = wide.sample(0.5, seed = 7)
    assert(Par.spread(wideSample) eq wideSample)
    // a limit over ANY child lands on one partition (GlobalLimit plans a
    // SinglePartition exchange) — spread must widen it even when the child
    // is wide or derived
    val limitOverWide = wide.limit(500)
    assert(Par.spread(limitOverWide).rdd.getNumPartitions === p)
  }

  test("spread returns derived (post-shuffle) frames unchanged without probing") {
    // an aggregated frame already runs at shuffle.partitions parallelism;
    // with AQE on, probing it via .rdd would eagerly execute the shuffle —
    // spread must hand it back untouched (same plan object)
    val derived = spark.range(100).toDF("id")
      .groupBy(pmod(col("id"), lit(7)).as("k")).agg(count(lit(1)).as("n"))
    assert(Par.spread(derived) eq derived)
  }
}
