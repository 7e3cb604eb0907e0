package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CosineSimilarity.cosine_sim
import graft.functions.TopKByScore

/** The bounded-heap top-k Aggregator: agreement with the window (rank)
  * formulation on the real q39 workload, partition invariance, and tie
  * handling. */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window-based q39 top-5 on real embeddings") {
    val dir = sf("sf0.001")
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("score", round(cosine_sim(col("qe"), col("ce")), 4))
    val viaAgg = scored.groupBy("qid")
      .agg(TopKByScore.top_k(5)(col("cid"), col("score")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("cid"), col("s.score").as("score"))
    val viaWindow = SparkEntry.queries("q39_cosine_topk")(spark, dir)
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }

  test("q56 plan: partial object-hash aggregation, no window sort (hot path)") {
    val df = SparkEntry.queries("q56_topk_agg")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // bounded heap combines map-side: partial_ + final aggregation modes
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_topkbyscore"),
      s"no partial aggregation:\n$plan")
    // the scored candidate set is never window-sorted (q39's formulation);
    // the only Sort allowed is the deterministic output orderBy
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
  }

  test("partition invariance and tie-break toward smaller id") {
    val data = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.9), (1L, 13L, 0.9),
      (1L, 2L, 0.5), (1L, 3L, 0.99), (2L, 7L, 0.1)
    ).toDF("g", "id", "score")
    def run(parts: Int) = data.repartition(parts).groupBy("g")
      .agg(TopKByScore.top_k(3)(col("id"), col("score")).as("top"))
      .select(col("g"), col("top"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    val one = run(1)
    val many = run(13)
    assert(one == many)
    // g=1: best 0.99(id 3), then 0.9 ties -> ids 10, 11
    assert(one(1L) == Seq((3L, 0.99), (10L, 0.9), (11L, 0.9)))
    assert(one(2L) == Seq((7L, 0.1)))
  }
}
