package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias, Union}

object Par {

  /** Ensure an expensive per-row kernel runs with at least
    * defaultParallelism partitions: a tiny input (few parquet splits) would
    * otherwise execute the map at scan parallelism. At real scale the scan
    * already yields >= defaultParallelism splits and this is a no-op — no
    * shuffle is ever added for large inputs.
    *
    * The partition-count probe (`df.rdd.getNumPartitions`) only runs when
    * the plan is SCAN-SHAPED (projections/filters over leaves): with AQE on,
    * `.rdd` on a plan containing an exchange forces getFinalPhysicalPlan,
    * eagerly executing every upstream shuffle stage for a probe whose
    * results the consumer then re-plans and re-executes from `df`. A derived
    * frame that already crossed a shuffle runs at
    * `spark.sql.shuffle.partitions` parallelism by construction, so it is
    * returned unchanged — no probe, no hidden double execution.
    *
    * Caveat (partition COUNT is the heuristic, not row distribution): a
    * union leg that contributes many near-empty partitions — e.g.
    * `spark.range(1)` materializes defaultParallelism partitions for one
    * row — can push the count past the threshold while the real rows sit in
    * a few fat scan splits. Single-row literal legs should be
    * LocalRelations (`Seq(...).toDF`, one partition), which is also the
    * idiomatic construction.
    */
  def spread(df: DataFrame): DataFrame = {
    if (!scanShaped(df.queryExecution.logical)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
  }

  /** True when the plan is only narrow exchange-free operators over leaves
    * (projections, filters, unions) — the shapes whose physical probe runs
    * no job and is therefore free.
    */
  private def scanShaped(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case p: Project => scanShaped(p.child)
    case f: Filter => scanShaped(f.child)
    case s: SubqueryAlias => scanShaped(s.child)
    case u: Union => u.children.forall(scanShaped)
    case _ => false
  }
}
