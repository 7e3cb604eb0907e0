package graft

import org.apache.spark.sql.functions._
import graft.operators.PlanLint

/** PlanLint must flag the constructions that die at scale and stay quiet
  * on the plans the library actually ships on its hot paths. */
class PlanLintSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("flags a cartesian product") {
    // a broadcastable side plans as BroadcastNestedLoopJoin, a big one as
    // CartesianProduct — both are the |L|·|R| shape the lint must surface
    val o = Tables(spark, dir, "orders").select("o_orderkey")
    val c = Tables(spark, dir, "customer").select("c_custkey")
    val findings = PlanLint.audit(o.crossJoin(c))
    assert(findings.exists(f =>
      f.rule == "cartesian-product" || f.rule == "nested-loop-join"),
      findings.mkString("; "))
  }

  test("flags a non-equi nested-loop join") {
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
    val theta = l.join(o, col("l_extendedprice") > col("o_totalprice"))
    val findings = PlanLint.audit(theta)
    assert(findings.exists(f =>
      f.rule == "nested-loop-join" || f.rule == "cartesian-product"),
      findings.mkString("; "))
  }

  test("flags an unpartitioned window over a full table") {
    val w = org.apache.spark.sql.expressions.Window.orderBy("l_orderkey")
    val running = Tables(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
    val findings = PlanLint.audit(running)
    assert(findings.exists(_.rule == "single-partition-window"), findings.mkString("; "))
  }

  test("hot-path queries stay lint-clean") {
    // the flagship relational/dedup/similarity paths must carry none of
    // the flagged shapes. Deliberately absent: tiny-aggregate windows
    // (q208 on |sources| rows) and the broadcast-query cross-score
    // pattern (q39/q56 nested-loop over a k-row broadcast side) — both
    // are advisory findings a reviewer signs off on, not regressions
    for (q <- Seq("q01_pricing_summary", "q03_shipping_priority", "q35_dedup_exact",
        "q37_minhash_lsh", "q104_funnel", "q121_sessions",
        "q213_profit", "q219_hist_quantiles")) {
      val findings = PlanLint.audit(SparkEntry.queries(q)(spark, dir))
      assert(findings.isEmpty, s"$q: ${findings.mkString("; ")}")
    }
  }

  test("q74's distributed prefix sum is exactly the fix for the flagged window form") {
    import org.apache.spark.sql.expressions.Window
    val toksDf = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
    // naive global running sum: flagged
    val naive = toksDf.withColumn("s",
      sum("n").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(PlanLint.audit(naive).exists(_.rule == "single-partition-window"))
    // the shipped two-phase form: clean
    val fixed = graft.operators.PrefixSum.runningSum(toksDf, "doc_id", "n", "s")
    assert(PlanLint.audit(fixed).isEmpty,
      PlanLint.audit(fixed).mkString("; "))
  }
}
