package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.JaroWinkler

/** The native jaro_winkler expression: pinned reference values (the
  * published test vectors DuckDB's jaro_winkler_similarity also
  * reproduces), edge semantics, codegen participation, and SQL
  * registration. Cross-engine bit-parity on real data is covered by
  * q186's oracle gate.
  */
class JaroWinklerSpec extends SparkSpec {

  // textbook vectors + the DuckDB-pinned edge cases (empty scores 0)
  private val vectors = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("dwayne", "duane", 0.8400000000000001),
    ("crate", "trace", 0.7333333333333334), // jaro <= 0.7? no — no common prefix
    ("ab", "ax", 0.6666666666666666), // jaro <= 0.7: boost suppressed
    ("ab", "ba", 0.0), // window 0: adjacent transposition can't match
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("aaaaaaaaaa", "aaaaaaaaab", 0.96)) // 4-char prefix cap

  test("pinned reference vectors (helper, interpreted, both arg orders)") {
    vectors.foreach { case (a, b, want) =>
      assert(JaroWinkler.similarity(a, b) == want, s"'$a' vs '$b'")
      assert(JaroWinkler.similarity(b, a) == want, s"symmetric '$b' vs '$a'")
    }
  }

  test("expression evaluates inside a whole-stage-codegen span on parquet input") {
    val d = Tables(spark, sf("sf0.001"), "part")
    val df = d.select(col("p_name"),
      JaroWinkler.jaro_winkler(col("p_name"), lit("small ring")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("jaro_winkler"),
      s"no codegen span:\n$plan")
    // generated path ≡ static helper on every real row
    df.collect().foreach { r =>
      assert(r.getDouble(1) == JaroWinkler.similarity(r.getString(0), "small ring"))
    }
  }

  test("SQL-registered via GraftExtensions") {
    val rows = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta'), jaro_winkler(NULL, 'x')").head()
    assert(rows.getDouble(0) == 0.9611111111111111)
    assert(rows.isNullAt(1), "null-safe: NULL input must yield NULL")
  }
}
