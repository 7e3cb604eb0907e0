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

  test("q297 SemDeDup: drop ledger equals a driver-side within-cluster cosine scan") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("q297_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val vecs = Tables(spark, dir, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, rs) =>
      assert(rs.forall(_._3 == rs.length.toLong), s"cluster $cid n_members inconsistent")
      // the lowest id in a cluster has no lower-id mate: it can never drop
      val minVec = rs.map(_._1).min
      assert(rs.find(_._1 == minVec).get._4 == 0L, s"cluster $cid lowest id dropped")
      rs.filter(_._4 == 1L).foreach(r => assert(r._3 >= 2L))
    }
    // independent recomputation: same sequential-fold cosine, same
    // HALF_UP 4-dp rounding (Spark's round), same lower-id-wins rule
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectDropped = byCluster.values.flatMap { rs =>
      val ids = rs.map(_._1).sorted.toSeq
      ids.filter(j => ids.exists(i => i < j && r4(cos(vecs(i), vecs(j))) >= 0.45))
    }.toSet
    assert(out.filter(_._4 == 1L).map(_._1).toSet == expectDropped)
    assert(expectDropped.nonEmpty, "drop decision must be non-vacuous at sf0.001")
  }
}
