package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the event-analytics and sketch queries
  * (q105-q126) beyond the DuckDB hash gate: the numbers must mean what
  * they claim, not merely match the oracle's arithmetic.
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q105 retention: offset-0 row equals the cohort's size, retention never exceeds it") {
    val rows = SparkEntry.queries("q105_retention")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cohortSize = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(cohortSize.nonEmpty, "no offset-0 cohort rows")
    rows.foreach { case (cw, off, n) =>
      assert(cohortSize.contains(cw), s"cohort $cw missing its offset-0 row")
      assert(n <= cohortSize(cw),
        s"cohort $cw offset $off retained $n > cohort size ${cohortSize(cw)}")
    }
    // every user appears in exactly one cohort: offset-0 totals = |users|
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(cohortSize.values.sum == users)
  }

  test("q106 WAU >= DAU everywhere, and equals distinct actives of the trailing week") {
    val rows = SparkEntry.queries("q106_rolling_dau")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, wau) =>
      assert(wau >= dau, s"$d: wau $wau < dau $dau")
    }
    // spot-check one day against a direct trailing-7-day distinct count
    val (day, _, wau) = rows.last
    val direct = Tables(spark, dir, "events")
      .filter(to_date(col("ts")).between(date_sub(lit(day).cast("date"), 6), lit(day).cast("date")))
      .select("user_id").distinct().count()
    assert(wau == direct, s"$day: wau $wau != direct trailing-7 distinct $direct")
  }

  test("q107 transition probabilities sum to ~1 per source state") {
    val byPrev = SparkEntry.queries("q107_transitions")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(byPrev.nonEmpty)
    byPrev.foreach { case (prev, bpSum) =>
      // integer DIV truncates each cell: sum in (10000 - |cells|, 10000]
      assert(bpSum <= 10000 && bpSum > 10000 - 50,
        s"$prev: probability mass $bpSum bp")
    }
  }

  test("q121 sessionization conserves events and bounds session durations") {
    val rows = SparkEntry.queries("q121_sessions")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables(spark, dir, "events").count()
    assert(rows.map(_._3).sum == total, "sessionized events != input events")
    rows.foreach { case (u, nSess, nEv, maxEv, _) =>
      assert(nSess >= 1 && maxEv <= nEv,
        s"user $u: $nSess sessions, max $maxEv of $nEv events")
    }
  }

  test("sketch sanity: CMS never undercounts; KMV and HLL land near exact") {
    SparkEntry.queries("q117_cms")(spark, dir).collect().foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // 64-register HLL standard error is 1.04/sqrt(64) = 13%; KMV k=16 is
    // ~26%. 3-sigma-ish acceptance keeps the test meaningful but stable.
    SparkEntry.queries("q126_hll")(spark, dir).collect().foreach { r =>
      assert(r.getLong(3) <= 4000,
        s"HLL err ${r.getLong(3)} bp for ${r.getString(0)} (exact ${r.getLong(1)}, est ${r.getLong(2)})")
    }
    SparkEntry.queries("q111_kmv_distinct")(spark, dir).collect().foreach { r =>
      assert(r.getLong(3) <= 8000,
        s"KMV err ${r.getLong(3)} bp for ${r.getString(0)}")
    }
  }

  test("q124 arms partition the users and conversions are bounded by arm sizes") {
    val r = SparkEntry.queries("q124_ab_test")(spark, dir).collect().head
    val (nA, cA, nB, cB) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(nA + nB == users, s"arms $nA+$nB != $users users")
    assert(cA <= nA && cB <= nB && cA >= 0 && cB >= 0)
  }

  test("AnalyticsMain writes every report with rows, consistent across reports") {
    val out = java.nio.file.Files.createTempDirectory("graft_analytics").toString
    val counts = AnalyticsMain.run(spark, dir, out).toMap
    assert(counts.keySet == AnalyticsMain.reports.toSet)
    counts.foreach { case (name, n) => assert(n > 0, s"$name wrote no rows") }
    assert(counts("q124_ab_test") == 1)
    // cross-report consistency: the funnel and the conversion-lag report
    // must agree on how many users completed signup->view->purchase
    val funnelStage3 = spark.read.parquet(s"$out/q104_funnel")
      .filter(col("stage") === 3).count()
    val lagConverted = spark.read.parquet(s"$out/q125_conversion_lag")
      .agg(sum("n_converted")).head().getLong(0)
    assert(funnelStage3 == lagConverted,
      s"funnel stage-3 $funnelStage3 != conversion-lag converted $lagConverted")
  }

  test("word_ngrams Generator matches the expression form and runs in GenerateExec") {
    val docs = Tables(spark, dir, "documents")
    docs.createOrReplaceTempView("wng_docs")
    val gen = spark.sql(
      "SELECT doc_id, pos, ngram FROM wng_docs LATERAL VIEW word_ngrams(text, 3) t AS pos, ngram")
    // parity oracle: the q34 slice/zip_with array construction, exploded
    val toks = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(col("text"))), "\\s+"))
    val viaArrays = docs
      .withColumn("sh",
        when(size(toks) < 3, array().cast("array<string>"))
          .otherwise(zip_with(
            zip_with(slice(toks, lit(1), size(toks) - 2), slice(toks, lit(2), size(toks) - 2),
              (a, b) => concat(a, lit(" "), b)),
            slice(toks, lit(3), size(toks) - 2),
            (ab, c) => concat(ab, lit(" "), c))))
      .select(col("doc_id"), posexplode(col("sh")).as(Seq("pos", "ngram")))
    assert(gen.count() == viaArrays.count())
    assert(gen.exceptAll(viaArrays).isEmpty && viaArrays.exceptAll(gen).isEmpty,
      "generator and expression-form n-grams diverge")
    // the generator must execute in GenerateExec (streamed rows), and the
    // scalar fallback path must never plan
    val plan = gen.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"no GenerateExec in:\n$plan")
    // empty / short / null inputs produce no rows instead of failing
    import spark.implicits._
    Seq((1L, ""), (2L, "one two"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").createOrReplaceTempView("wng_edge")
    assert(spark.sql(
      "SELECT ngram FROM wng_edge LATERAL VIEW word_ngrams(text, 3) t AS pos, ngram")
      .count() == 0)
  }

  test("q116 reachability agrees with a DataFrame-side BFS on the same DAG") {
    import org.apache.spark.sql.DataFrame
    val edges = queries.Dedup.lshPairs(
        queries.Dedup.minhashBase(Tables(spark, dir, "documents")),
        queries.Dedup.LshBucketCap)
      .select(col("d1"), col("d2")).localCheckpoint(true)
    // 5 joins of distinct frontiers == depth-<=5 distinct reachability
    var frontier: DataFrame = edges.select(col("d1").as("src"), col("d2").as("dst"))
    var all = frontier
    for (_ <- 2 to 5) {
      frontier = frontier.join(
          edges.select(col("d1").as("dst"), col("d2").as("nxt")), Seq("dst"))
        .select(col("src"), col("nxt").as("dst"))
      all = all.union(frontier)
    }
    val expect = all.distinct().groupBy("src")
      .agg(count(lit(1)).as("n_reach"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q116_reachability")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"recursive CTE reachability diverged: $got vs $expect")
  }
}
