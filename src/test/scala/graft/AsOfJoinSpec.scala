package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoin

/** The native as-of join (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec,
  * injected via GraftExtensions): agreement with the window formulation
  * (q48), physical-plan shape, partition invariance, null-key grouping,
  * and no-match null padding. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with the window formulation on real events") {
    val native = SparkEntry.queries("q58_native_asof")(spark, sf("sf0.01"))
    val window = SparkEntry.queries("q48_asof_join")(spark, sf("sf0.01"))
    assert(native.exceptAll(window).count() == 0)
    assert(window.exceptAll(native).count() == 0)
    assert(native.count() > 0)
  }

  test("plan contains AsOfJoinExec with exchanges planned by EnsureRequirements") {
    val df = SparkEntry.queries("q58_native_asof")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec not planned:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no co-partitioning:\n$plan")
    assert(plan.contains("Sort"), s"no intra-partition sort:\n$plan")
  }

  test("strictly-prior semantics, null keys group, no match -> nulls") {
    val left = Seq(
      (10L, 1L),  // prior right: 5
      (3L, 1L),   // prior right: none (5 >= 3... no: 5>3, none strictly before 3)
      (7L, 2L),   // user 2 has no views -> nulls
      (9L, -1L)   // stand-in for a "null-ish" distinct group
    ).toDF("event_id", "user_id")
    val right = Seq(
      (5L, 1L), (10L, 1L), // 10 is NOT prior to left 10 (strict <)
      (8L, -1L)
    ).toDF("event_id", "user_id")
    val out = AsOfJoin.asofPrior(left, right,
        "user_id" -> "user_id", "event_id" -> "event_id")
      .select("event_id", "user_id", "r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -999L else r.getLong(2))).toSet
    assert(out == Set((10L, 1L, 5L), (3L, 1L, -999L), (7L, 2L, -999L), (9L, -1L, 8L)))
  }

  test("null keys form their own group (window PARTITION BY semantics)") {
    val left = Seq((Some(1L), 10L), (None, 20L), (None, 5L))
      .toDF("k", "o").selectExpr("o AS event_id", "k AS user_id")
    val right = Seq((None: Option[Long], 15L), (Some(1L), 4L))
      .toDF("k", "o").selectExpr("o AS event_id", "k AS user_id")
    val out = AsOfJoin.asofPrior(left, right,
        "user_id" -> "user_id", "event_id" -> "event_id")
      .select("event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1))).toSet
    // null-key left@20 matches null-key right@15; null-key left@5 has none;
    // key-1 left@10 matches key-1 right@4
    assert(out == Set((20L, 15L), (5L, -999L), (10L, 4L)))
  }

  test("emits UnsafeRow: direct orderBy/shuffle over the exec output works") {
    // no intermediate select/Project — the sort's exchange consumes the
    // exec's rows directly, which requires UnsafeRow output
    val ev = Tables(spark, sf("sf0.001"), "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id")
    val v = ev.filter(col("event_type") === "view").select("event_id", "user_id")
    val direct = AsOfJoin.asofPrior(p, v, "user_id" -> "user_id",
        "event_id" -> "event_id")
      .orderBy("event_id")
      .collect()
    assert(direct.nonEmpty)
  }

  test("partition invariance: result independent of input partitioning") {
    val ev = Tables(spark, sf("sf0.001"), "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id")
    val v = ev.filter(col("event_type") === "view").select("event_id", "user_id")
    def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asofPrior(l, r, "user_id" -> "user_id", "event_id" -> "event_id")
        .select("event_id", "r_event_id").collect()
        .map(r0 => (r0.getLong(0), if (r0.isNullAt(1)) -1L else r0.getLong(1))).toSet
    assert(run(p, v) == run(p.repartition(7), v.repartition(3)))
  }
}
