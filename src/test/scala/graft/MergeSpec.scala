package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** operators/Merge: keyed upsert verdicts on a hand-built case matrix
  * (every MERGE outcome incl. the unmatched-delete no-op and
  * last-writer-wins feed dedup), SCD2 run-collapse semantics, and the
  * incremental invariant that makes MERGE a production loop: applying two
  * change batches in sequence equals applying their LWW union once. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("merge verdicts: keep / update / insert / delete / unmatched-delete no-op") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "price")
    val feed = Seq(
      (2L, "b2", 21.0, "U", 1L),  // update
      (3L, "c", 30.0, "D", 1L),   // delete
      (4L, "d", 40.0, "U", 1L),   // insert
      (5L, "e", 50.0, "D", 1L),   // unmatched delete: no-op
      (2L, "b3", 22.0, "U", 2L))  // LWW: beats version 1 for key 2
      .toDF("k", "v", "price", "op", "version")
    val latest = Merge.latestByKey(feed, Seq("k"), "version")
    assert(latest.count() === 4) // one row per key
    val out = Merge.merge(target, latest, Seq("k"), "op", Seq("v", "price"))
      .orderBy("k").collect().toSeq
    assert(out === Seq(
      Row(1L, "a", 10.0, "keep"),
      Row(2L, "b3", 22.0, "update"),
      Row(4L, "d", 40.0, "insert")))
  }

  test("merge is incremental: batch1 then batch2 == LWW union applied once") {
    val target = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("v"))
    def feed(mod: Int, bump: Double, ver: Long) = target
      .filter(col("k") % mod === 0)
      .select(col("k"), (col("price") + bump).as("price"), col("v"),
        when(col("k") % 9 === 0, "D").otherwise("U").as("op"), lit(ver).as("version"))
    val b1 = feed(3, 100.0, 1L)
    val b2 = feed(4, 200.0, 2L)
    val seq2 = Merge.merge(
      Merge.merge(target, Merge.latestByKey(b1, Seq("k"), "version"),
        Seq("k"), "op", Seq("price", "v")).drop("action"),
      Merge.latestByKey(b2, Seq("k"), "version"), Seq("k"), "op", Seq("price", "v"))
      .drop("action")
    val once = Merge.merge(target,
      Merge.latestByKey(b1.unionAll(b2), Seq("k"), "version"),
      Seq("k"), "op", Seq("price", "v")).drop("action")
    assert(seq2.exceptAll(once).isEmpty && once.exceptAll(seq2).isEmpty)
  }

  test("cdcDiff roundtrip law: merge(old, cdcDiff(old, new)) == new") {
    val orders = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
    def snap(f: org.apache.spark.sql.Column) = orders.filter(f)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val old = snap(col("o_orderkey") % 10 =!= 0)
    val nw = snap(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 50.0)
          .otherwise(col("o_totalprice")))
    val feed = Merge.cdcDiff(old, nw, Seq("o_orderkey"),
      Seq("o_totalprice", "o_orderstatus"))
    // the feed is delta-sized: unchanged keys never appear
    assert(feed.filter(col("op") === "U").count() > 0)
    assert(feed.count() < old.count())
    val replayed = Merge.merge(old, feed, Seq("o_orderkey"), "op",
      Seq("o_totalprice", "o_orderstatus")).drop("action")
    assert(replayed.exceptAll(nw).isEmpty && nw.exceptAll(replayed).isEmpty)
  }

  test("scd2 collapses runs, bounds versions half-open, flags current") {
    val log = Seq(
      (1L, 1L, "x"), (1L, 2L, "x"), (1L, 3L, "y"), (1L, 4L, "x"),
      (2L, 1L, "z"))
      .toDF("k", "seq", "attr")
    val out = Merge.scd2(log, "k", Seq(col("seq")), "attr")
      .select("k", "version", "attr", "effective_from", "effective_to",
        "n_changes", "is_current")
      .orderBy("k", "version").collect().toSeq
    assert(out === Seq(
      Row(1L, 1L, "x", 1L, 3L, 2L, false),
      Row(1L, 2L, "y", 3L, 4L, 1L, false),
      Row(1L, 3L, "x", 4L, null, 1L, true),
      Row(2L, 1L, "z", 1L, null, 1L, true)))
  }

  test("scd2Apply incremental == from-scratch over the concatenated log") {
    val ev = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .filter(col("user_id") % 3 === 0)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    // time split: everything before the cutoff is the standing dimension,
    // the rest arrives as the delta batch. Some users sit entirely on one
    // side (untouched-open and absent-key paths both exercised); with 5
    // event types the equal-attr absorb path occurs naturally too.
    val a = ev.filter(expr("ts < TIMESTAMP '2024-01-05 00:00:00'"))
    val b = ev.filter(expr("ts >= TIMESTAMP '2024-01-05 00:00:00'"))
    assert(a.count() > 0 && b.count() > 0)
    val cols = Seq("user_id", "event_type", "effective_from", "effective_to",
      "n_changes", "version", "is_current").map(col)
    val inc = Merge.scd2Apply(
      Merge.scd2(a, "user_id", Seq(col("ts"), col("event_id")), "event_type"),
      b, "user_id", Seq(col("ts"), col("event_id")), "event_type").select(cols: _*)
    val scratch = Merge.scd2(ev, "user_id", Seq(col("ts"), col("event_id")),
      "event_type").select(cols: _*)
    assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty)
  }

  test("scd2: leading NULL attribute still opens version 1") {
    val log = Seq((1L, 1L, null: String), (1L, 2L, "a"))
      .toDF("k", "seq", "attr")
    val out = Merge.scd2(log, "k", Seq(col("seq")), "attr")
      .orderBy("version").select("version", "attr").collect().toSeq
    assert(out === Seq(Row(1L, null), Row(2L, "a")))
  }
}
