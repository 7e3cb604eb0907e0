package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum.
  *
  * A global running total (`sum(...) OVER (ORDER BY k)` with no PARTITION
  * BY) makes Spark funnel EVERY row through one task (`Exchange
  * SinglePartition` + one Window) — fine at test scale, a dead end at
  * 100 TB. The classic fix is the two-phase prefix sum:
  *
  *  1. range-partition by the order key and sort within partitions — the
  *     global order becomes (partition asc, row-in-partition asc);
  *  2. per-partition totals: ONE tiny row per partition crosses to the
  *     driver, which turns them into exclusive cumulative bases;
  *  3. broadcast the bases back; each partition computes its local running
  *     sum in parallel and adds its base.
  *
  * Only the per-partition totals (≈ #partitions rows) are ever centralized;
  * every full-data pass stays partition-parallel. The order key must be
  * globally unique (range partitioning must not split ties; all graft
  * callers order by a unique id per SURVEY §7.4.2).
  */
object PrefixSum {

  /** Adds `endCol` = inclusive global running sum of `valueCol` over rows
    * ordered by the (unique) `orderCol`. `valueCol` must be integral —
    * long sums are exact, so the result is independent of partitioning. */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
                 endCol: String, partitions: Int = 0): DataFrame = {
    val parts = if (partitions > 0) partitions
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    // RangePartitioner samples with a seed derived from the per-execution
    // RDD id, so two separate jobs over the same lineage can draw DIFFERENT
    // partition boundaries — the bases job and the final job would then
    // disagree on __pid and the running sum would be silently wrong. An
    // eager localCheckpoint materializes the partitioning ONCE; both jobs
    // read the same frozen blocks (and __pid is baked into the rows), and
    // the ContextCleaner reclaims the blocks when the plan is unreferenced.
    val ranged = df
      .repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)

    // phase 2: one row per partition to the driver, exclusive prefix bases
    val totals = ranged.groupBy("__pid")
      .agg(sum(col(valueCol).cast("long")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init.zip(totals).map { case ((_, base), (pid, _)) => (pid, base) }

    // phase 3: local running sums in parallel, shifted by the bases
    import df.sparkSession.implicits._
    val baseDf = bases.toSeq.toDF("__pid", "__base")
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(baseDf), Seq("__pid"))
      .withColumn(endCol, col("__base") + sum(col(valueCol).cast("long")).over(w))
      .drop("__pid", "__base")
  }
}
