package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.AggState

/** operators/AggState: the standing partial-aggregate table. The two
  * invariants that make it production-usable:
  *  - incremental (build + N appends) merged view ≡ one from-scratch
  *    groupBy over the union — exactly, not approximately;
  *  - optimize collapses slice rows without changing the merged view
  *    (and refuses an in-place rewrite).
  */
class AggStateSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_aggstate").toString

  test("build + appends merged == from-scratch groupBy, exactly") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp()
    val keys = Seq("source", "lang")
    AggState.build(docs.filter(col("doc_id") % 4 === 0), keys, "n_chars", dir)
    (1 to 3).foreach { r =>
      AggState.append(docs.filter(col("doc_id") % 4 === r), keys, "n_chars", dir)
    }
    val inc = AggState.merged(spark, dir, keys)
    val scratch = docs.groupBy("source", "lang")
      .agg(count(lit(1)).cast("long").as("n"), sum("n_chars").as("sum"),
        min("n_chars").as("min"), max("n_chars").as("max"))
    assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty)
  }

  test("optimize collapses to one row per key and preserves the merged view") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp(); val out = tmp()
    val keys = Seq("source")
    // split by doc_id RANGE: source is doc_id%20, so modulus splits give
    // disjoint key sets and the pre-optimize ">" assert would be vacuous
    AggState.build(docs.filter(col("doc_id") < 250), keys, "n_chars", dir)
    AggState.append(docs.filter(col("doc_id") >= 250), keys, "n_chars", dir)
    val before = AggState.merged(spark, dir, keys)
    val nKeys = before.count()
    // pre-optimize the state holds two slice rows per key
    assert(spark.read.parquet(s"$dir/state").count() > nKeys)
    AggState.optimize(spark, dir, out, keys)
    assert(spark.read.parquet(s"$out/state").count() === nKeys)
    val after = AggState.merged(spark, out, keys)
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)
    intercept[IllegalArgumentException] {
      AggState.optimize(spark, dir, dir, keys)
    }
  }
}
