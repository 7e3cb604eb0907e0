package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LevenshteinBoundRule

/** The injected optimizer rule: adds the |len(a)-len(b)| lower-bound guard
  * to levenshtein threshold predicates, idempotently, without changing
  * results. Installed here via spark.experimental (same rule object that
  * GraftExtensions injects at session build time). */
class LevenshteinBoundRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinBoundRule
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == LevenshteinBoundRule)
  }

  private def docs = Tables(spark, sf("sf0.001"), "documents")

  test("filter gains the length guard and results are unchanged") {
    val q = docs.filter(levenshtein(col("text"), lit("spark query engine")) <= 5)
      .select("doc_id")
    val (guardedPlan, guardedRows) = withRule {
      (q.queryExecution.optimizedPlan.toString(), q.collect().map(_.getLong(0)).toSet)
    }
    assert(guardedPlan.contains("abs((length(text"), s"no guard in:\n$guardedPlan")
    val plainRows = q.collect().map(_.getLong(0)).toSet
    assert(guardedRows == plainRows)
  }

  test("rule is idempotent (no stacked guards)") {
    withRule {
      val q = docs.filter(levenshtein(col("text"), lit("abc")) <= 3)
      val plan = q.queryExecution.optimizedPlan.toString()
      val occurrences = "abs\\(\\(length\\(text".r.findAllIn(plan).length
      assert(occurrences == 1, s"expected exactly one guard:\n$plan")
    }
  }

  test("join conditions are strengthened too") {
    withRule {
      val d = docs.limit(50).select(col("doc_id"), col("text"))
      val a = d.select(col("doc_id").as("d1"), col("text").as("t1"))
      val b = d.select(col("doc_id").as("d2"), col("text").as("t2"))
      val j = a.join(b, col("d1") < col("d2") &&
        levenshtein(col("t1"), col("t2")) <= 8)
      val plan = j.queryExecution.optimizedPlan.toString()
      assert(plan.contains("abs((length(t1"), s"no join guard in:\n$plan")
      assert(j.count() >= 0)
    }
  }
}
