package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CosineSimilarity

/** The native cosine_sim expression: bit-parity with the HOF formulation,
  * codegen participation, SQL registration via both the registry helper and
  * SparkSessionExtensions-injected builder, and null/edge semantics. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, sf("sf0.001"), "embeddings")

  private def hofCosine = {
    val dot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (nrm(col("a")) * nrm(col("b")))
  }

  test("bit-identical to the HOF formulation on real embeddings") {
    val pairs = emb.select(col("embedding").as("a"), col("vec_id"))
      .crossJoin(emb.filter(col("vec_id") < 3).select(col("embedding").as("b")))
    val diff = pairs
      .withColumn("nat", CosineSimilarity.cosine_sim(col("a"), col("b")))
      .withColumn("hof", hofCosine)
      .filter(col("nat") =!= col("hof")) // bit-level: same order, same types
      .count()
    assert(diff == 0)
  }

  test("participates in whole-stage codegen") {
    val df = emb.select(CosineSimilarity.cosine_sim(col("embedding"), col("embedding")).as("c"))
    val plan = df.queryExecution.executedPlan.toString()
    // '*(n)' prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project") && plan.contains("cosine_sim"),
      s"no codegen span:\n$plan")
    // and it evaluates: self-similarity is 1.0 (up to fp)
    val vals = df.as[Double].collect()
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("SQL registration: registry helper and extensions builder") {
    CosineSimilarity.register(spark)
    emb.createOrReplaceTempView("emb_cs")
    val n = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_cs").filter("c > 0.999999").count()
    assert(n == emb.count())
  }

  test("null input yields null; zero vector yields NaN") {
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (None, Some(Seq(1.0f, 0.0f))),
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 0.0f)))
    ).toDF("a", "b")
    val out = df.select(CosineSimilarity.cosine_sim(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0).isNaN)
  }
}
