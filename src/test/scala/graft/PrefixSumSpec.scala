package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** The distributed two-phase prefix sum: agreement with the (single-task)
  * global-window form, no SinglePartition funnel in the plan, and
  * invariance to input partitioning. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Tables(spark, sf("sf0.001"), "documents")
    .select(col("doc_id"),
      when(length(trim(col("text"))) === 0, lit(0))
        .otherwise(size(split(lower(trim(col("text"))), "\\s+"))).cast("long")
        .as("n"))

  test("matches the global-window running sum exactly") {
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = tokens.withColumn("e", sum("n").over(w))
      .select("doc_id", "e").as[(Long, Long)].collect().toMap
    val dist = PrefixSum.runningSum(tokens, "doc_id", "n", "e", partitions = 7)
      .select("doc_id", "e").as[(Long, Long)].collect().toMap
    assert(dist == windowed && dist.nonEmpty)
  }

  test("plan has no SinglePartition exchange (the point of the operator)") {
    val dist = PrefixSum.runningSum(tokens, "doc_id", "n", "e", partitions = 7)
    val plan = dist.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"prefix sum still funnels through one task:\n$plan")
    // the window form DOES — proving the assertion bites
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowedPlan = tokens.withColumn("e", sum("n").over(w))
      .queryExecution.executedPlan.toString
    assert(windowedPlan.contains("Exchange SinglePartition"))
  }

  test("invariant to input partitioning and partition-count choice") {
    def run(in: org.apache.spark.sql.DataFrame, p: Int) =
      PrefixSum.runningSum(in, "doc_id", "n", "e", partitions = p)
        .select("doc_id", "e").as[(Long, Long)].collect().toMap
    val a = run(tokens, 3)
    val b = run(tokens.repartition(11), 8)
    assert(a == b)
  }

  test("empty input yields an empty result") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n")
    assert(PrefixSum.runningSum(empty, "doc_id", "n", "e").count() == 0)
  }
}
