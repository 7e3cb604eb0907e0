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

  test("broadcast variant: same rows as the merge exec, zero left-side exchange") {
    val ev = Tables(spark, sf("sf0.01"), "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id")
    val v = ev.filter(col("event_type") === "view").select("event_id", "user_id")
    val b = AsOfJoin.asofPriorBroadcast(p, v,
      "user_id" -> "user_id", "event_id" -> "event_id")
    val m = AsOfJoin.asofPrior(p, v,
      "user_id" -> "user_id", "event_id" -> "event_id")
    assert(b.exceptAll(m).count() == 0 && m.exceptAll(b).count() == 0)
    assert(b.count() > 0)
    val plan = b.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinBroadcast"), s"broadcast exec not planned:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"right side not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"left side shuffled — the whole point was zero exchanges:\n$plan")
  }

  test("broadcast variant: strictly-prior, null-key group, no-match nulls, ts ord") {
    val left = Seq(("2024-01-01 10:00:00", 1L, 100L), ("2024-01-01 08:00:00", 1L, 101L),
        ("2024-01-01 12:00:00", 2L, 102L))
      .toDF("t", "u", "id").select(to_timestamp(col("t")).as("ts"), col("u"), col("id"))
    val right = Seq(("2024-01-01 09:30:00", 1L, 200L), ("2024-01-01 10:00:00", 1L, 201L),
        ("2024-01-01 11:00:00", 2L, 202L))
      .toDF("t", "u", "id").select(to_timestamp(col("t")).as("ts"), col("u"), col("id"))
    val out = AsOfJoin.asofPriorBroadcast(left, right, "u" -> "u", "ts" -> "ts")
      .select("id", "r_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == Set((100L, 200L), (101L, -1L), (102L, 202L)))

    val ln = Seq((Some(1L), 10L), (None, 20L), (None, 5L))
      .toDF("k", "o").selectExpr("o AS event_id", "k AS user_id")
    val rn = Seq((None: Option[Long], 15L), (Some(1L), 4L))
      .toDF("k", "o").selectExpr("o AS event_id", "k AS user_id")
    val out2 = AsOfJoin.asofPriorBroadcast(ln, rn,
        "user_id" -> "user_id", "event_id" -> "event_id")
      .select("event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1))).toSet
    assert(out2 == Set((20L, 15L), (5L, -999L), (10L, 4L)))
  }

  test("type matrix: raw TimestampType ord (no pre-cast to long)") {
    val left = Seq(("2024-01-01 10:00:00", 1L, 100L), ("2024-01-01 08:00:00", 1L, 101L),
        ("2024-01-01 12:00:00", 2L, 102L))
      .toDF("t", "u", "id")
      .select(to_timestamp(col("t")).as("ts"), col("u"), col("id"))
    val right = Seq(("2024-01-01 09:30:00", 1L, 200L), ("2024-01-01 10:00:00", 1L, 201L),
        ("2024-01-01 11:00:00", 2L, 202L))
      .toDF("t", "u", "id")
      .select(to_timestamp(col("t")).as("ts"), col("u"), col("id"))
    val out = AsOfJoin.asofPrior(left, right, "u" -> "u", "ts" -> "ts")
      .select("id", "r_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // 100@10:00 -> 200@09:30 (201@10:00 is not strictly prior);
    // 101@08:00 -> none; 102@12:00 -> 202@11:00
    assert(out == Set((100L, 200L), (101L, -1L), (102L, 202L)))
  }

  test("type matrix: StringType key and ord (binary collation order)") {
    val left = Seq(("alpha", "2024-03", 1L), ("beta", "2024-01", 2L))
      .toDF("k", "month", "id")
    val right = Seq(("alpha", "2024-01", 10L), ("alpha", "2024-02", 11L),
        ("beta", "2024-01", 12L)).toDF("k", "month", "id")
    val out = AsOfJoin.asofPrior(left, right, "k" -> "k", "month" -> "month")
      .select("id", "r_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == Set((1L, 11L), (2L, -1L)))
  }

  test("type matrix: DateType ord and IntegerType key") {
    val left = Seq((1, "2024-02-10", 1L), (2, "2024-02-10", 2L))
      .toDF("k", "d", "id").select(col("k"), to_date(col("d")).as("d"), col("id"))
    val right = Seq((1, "2024-02-09", 10L), (1, "2024-02-10", 11L))
      .toDF("k", "d", "id").select(col("k"), to_date(col("d")).as("d"), col("id"))
    val out = AsOfJoin.asofPrior(left, right, "k" -> "k", "d" -> "d")
      .select("id", "r_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, -1L)))
  }

  test("duplicate column names fail loudly instead of binding the first match") {
    val left = Seq((1L, 2L)).toDF("a", "b")
      .select(col("a").as("k"), col("b").as("k"))
    val right = Seq((1L, 2L)).toDF("k", "o")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofPrior(left, right, "k" -> "k", "k" -> "o")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("mismatched left/right types and non-orderable types are rejected") {
    val l = Seq((1L, 1L)).toDF("k", "o")
    val rInt = Seq((1, 1L)).toDF("k", "o") // int key vs long key
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asofPrior(l, rInt, "k" -> "k", "o" -> "o")
    }
    assert(e1.getMessage.contains("key types differ"))
    val lMap = Seq((1L, 1L)).toDF("k", "o")
      .select(map(col("k"), col("o")).as("k"), col("o"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofPrior(lMap, l, "k" -> "k", "o" -> "o")
    }
    assert(e2.getMessage.contains("orderable"))
  }

  test("broadcast variant: hash-unsafe key types rejected at construction") {
    // array keys have no value-based equals on UnsafeArrayData and binary
    // keys compare by identity — a HashMap probe would silently match
    // nothing; the merge exec (ordering-based) still accepts them
    val l = Seq((1L, 1L)).toDF("k", "o").select(array(col("k")).as("k"), col("o"))
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asofPriorBroadcast(l, l, "k" -> "k", "o" -> "o")
    }
    assert(e1.getMessage.contains("atomic non-binary"))
    val lb = Seq((Array[Byte](1), 1L)).toDF("k", "o")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofPriorBroadcast(lb, lb, "k" -> "k", "o" -> "o")
    }
    assert(e2.getMessage.contains("atomic non-binary"))
  }

  test("broadcast variant: -0.0 and 0.0 double keys are one group") {
    val left = Seq((-0.0, 10L, 1L), (0.0, 20L, 2L)).toDF("k", "o", "id")
    val right = Seq((0.0, 5L, 100L), (-0.0, 15L, 101L)).toDF("k", "o", "id")
    val out = AsOfJoin.asofPriorBroadcast(left, right, "k" -> "k", "o" -> "o")
      .select("id", "r_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // both left rows probe the SAME key group: prior-to-10 is 5, prior-to-20 is 15
    assert(out == Set((1L, 100L), (2L, 101L)), s"signed zero split the key group: $out")
  }

  test("tolerance: matches outside the lookback window yield nulls (both execs)") {
    val left = Seq((100L, 1L, 1L), (200L, 1L, 2L), (150L, 2L, 3L))
      .toDF("o", "k", "id")
    val right = Seq((95L, 1L, 10L), (120L, 1L, 11L), (40L, 2L, 12L))
      .toDF("o", "k", "id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "r_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // tolerance 50: left@100 ← right@95 (gap 5 ok); left@200 ← right@120
    // is the most recent prior but gap 80 > 50 → null (NOT falling back
    // to right@95); left@150 ← right@40 gap 110 → null
    val expect = Set((1L, 10L), (2L, -1L), (3L, -1L))
    val merge = AsOfJoin.asofPriorWithin(left, right, "k" -> "k", "o" -> "o",
      tolerance = 50L)
    val bcast = AsOfJoin.asofPriorWithin(left, right, "k" -> "k", "o" -> "o",
      tolerance = 50L, broadcastRight = true)
    assert(rows(merge) == expect)
    assert(rows(bcast) == expect)
  }

  test("inclusive (allow_exact_matches): equal ord attaches; strict does not") {
    val left = Seq((100L, 1L, 1L)).toDF("o", "k", "id")
    val right = Seq((100L, 1L, 10L), (90L, 1L, 11L)).toDF("o", "k", "id")
    def one(df: org.apache.spark.sql.DataFrame) = {
      val r = df.select("r_id").head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
    assert(one(AsOfJoin.asofPrior(left, right, "k" -> "k", "o" -> "o")) == 11L)
    assert(one(AsOfJoin.asofPriorWithin(left, right, "k" -> "k", "o" -> "o",
      tolerance = 1000L, inclusive = true)) == 10L)
    assert(one(AsOfJoin.asofPriorWithin(left, right, "k" -> "k", "o" -> "o",
      tolerance = 1000L, inclusive = true, broadcastRight = true)) == 10L)
  }

  test("tolerance rejects non-integral ord types at construction") {
    val left = Seq(("a", 1L)).toDF("o", "id")
    val right = Seq(("b", 2L)).toDF("o", "id")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofPriorWithin(left, right, "id" -> "id", "o" -> "o", tolerance = 5L)
    }
    assert(e.getMessage.contains("integral/temporal"))
  }

  test("q197 tolerance form ≡ unbounded form filtered by the same window") {
    val ev = Tables(spark, sf("sf0.001"), "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val v = ev.filter(col("event_type") === "view").select("event_id", "user_id", "ts")
    val tol = 3600L * 1000000L
    val bounded = AsOfJoin.asofPriorWithin(p, v, "user_id" -> "user_id", "ts" -> "ts",
        tolerance = tol)
      .select(col("event_id"), coalesce(col("r_event_id"), lit(-1L)).as("pv"))
    val unbounded = AsOfJoin.asofPrior(p, v, "user_id" -> "user_id", "ts" -> "ts")
      .select(col("event_id"),
        coalesce(when(expr("unix_micros(ts) - unix_micros(r_ts)") <= tol,
          col("r_event_id")), lit(-1L)).as("pv"))
    assert(bounded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      unbounded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
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
