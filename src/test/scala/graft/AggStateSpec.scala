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

  test("optimize rewrites EVERY subtable present: scalar + KMV + histogram") {
    // a stateDir that carries all three layouts (the shape q257/q268/q269
    // build) must come out of optimize with all three intact — a
    // generation missing distinct_state/hist_state would fail every
    // mergedDistinct/mergedHist read after a Generations publish switch
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp(); val out = tmp()
    val keys = Seq("source")
    def half(f: org.apache.spark.sql.Column) = docs.filter(f)
    AggState.build(half(col("doc_id") < 250), keys, "n_chars", dir)
    AggState.append(half(col("doc_id") >= 250), keys, "n_chars", dir)
    def terms(f: org.apache.spark.sql.Column) = docs.filter(f)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    AggState.buildDistinct(terms(col("doc_id") < 250), keys, "term", dir)
    AggState.appendDistinct(terms(col("doc_id") >= 250), keys, "term", dir)
    AggState.buildHist(half(col("doc_id") < 250), keys, "n_chars", dir)
    AggState.appendHist(half(col("doc_id") >= 250), keys, "n_chars", dir)

    val beforeD = AggState.mergedDistinct(spark, dir, keys).collect().toSet
    val beforeH = AggState.mergedHist(spark, dir, keys).collect().toSet
    AggState.optimize(spark, dir, out, keys)
    // every subtable exists in the output generation...
    assert(new java.io.File(s"$out/state").isDirectory)
    assert(new java.io.File(s"$out/distinct_state").isDirectory)
    assert(new java.io.File(s"$out/hist_state").isDirectory)
    // ...collapsed (one KMV row per key; hist rows = occupied buckets,
    // fewer than the two-slice input)...
    val nKeys = AggState.merged(spark, out, keys).count()
    assert(spark.read.parquet(s"$out/distinct_state").count() === nKeys)
    assert(spark.read.parquet(s"$out/hist_state").count() <
      spark.read.parquet(s"$dir/hist_state").count())
    // ...and the merged views are unchanged
    assert(AggState.mergedDistinct(spark, out, keys).collect().toSet === beforeD)
    assert(AggState.mergedHist(spark, out, keys).collect().toSet === beforeH)
  }

  test("optimize on a sketch-only stateDir rewrites just that subtable") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp(); val out = tmp()
    AggState.buildHist(docs, Seq("lang"), "n_chars", dir)
    val before = AggState.mergedHist(spark, dir, Seq("lang")).collect().toSet
    AggState.optimize(spark, dir, out, Seq("lang"))
    assert(!new java.io.File(s"$out/state").isDirectory)
    assert(AggState.mergedHist(spark, out, Seq("lang")).collect().toSet === before)
  }

  test("retract: n/sum equal scratch-on-survivors; fully-retracted keys vanish") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp()
    val keys = Seq("source")
    AggState.build(docs.filter(col("doc_id") < 250), keys, "n_chars", dir)
    AggState.append(docs.filter(col("doc_id") >= 250), keys, "n_chars", dir)
    // retract a previously-added slice (the CDC delete shape)
    val deleted = docs.filter(col("doc_id") % 5 === 2)
    AggState.retract(deleted, keys, "n_chars", dir)

    val survivors = docs.filter(col("doc_id") % 5 =!= 2)
    val inc = AggState.merged(spark, dir, keys).select("source", "n", "sum")
    val scratch = survivors.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n"), sum("n_chars").as("sum"))
    assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty)

    // full retraction: a key with every row retracted must disappear
    val dir2 = tmp()
    AggState.build(docs, Seq("source", "lang"), "n_chars", dir2)
    val wipeKey = docs.select("source", "lang").limit(1).collect().head
    val wiped = docs.filter(col("source") === wipeKey.getString(0) &&
      col("lang") === wipeKey.getString(1))
    assert(wiped.count() > 0)
    AggState.retract(wiped, Seq("source", "lang"), "n_chars", dir2)
    val left = AggState.merged(spark, dir2, Seq("source", "lang"))
      .filter(col("source") === wipeKey.getString(0) &&
        col("lang") === wipeKey.getString(1))
    assert(left.count() === 0, "fully-retracted key still in the merged view")
  }

  test("retractExact: retracting the kept (min) copy promotes the next; " +
      "all four measures equal scratch-on-survivors") {
    import spark.implicits._
    val dir = tmp()
    // digest-map shape: key = dig, value = pid; "a" has three copies in
    // pid order 10 < 20 < 30, "b" two, "c" one (fully retracted below)
    val rows = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 5L), ("b", 7L),
      ("c", 99L)).toDF("dig", "pid")
    AggState.build(rows.filter(col("pid") < 15), Seq("dig"), "pid", dir)
    AggState.append(rows.filter(col("pid") >= 15), Seq("dig"), "pid", dir)
    // takedown retracts a's FIRST copy (the keeper), b's LAST (max), and
    // all of c — exercising the min-rebuild, the max-rebuild and the
    // vanish path in one call
    val deleted = Seq(("a", 10L), ("b", 7L), ("c", 99L)).toDF("dig", "pid")
    val survivors = Seq(("a", 20L), ("a", 30L), ("b", 5L)).toDF("dig", "pid")
    AggState.retractExact(spark, deleted, survivors, Seq("dig"), "pid", dir)
    val m = AggState.merged(spark, dir, Seq("dig")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // the SECOND copy of "a" is now the keeper — min is exact, not the
    // stale lifetime bound the plain retract would have left
    assert(m("a") == ((2L, 50L, 20L, 30L)), s"a: ${m.get("a")}")
    assert(m("b") == ((1L, 5L, 5L, 5L)), s"b: ${m.get("b")}")
    assert(!m.contains("c"), "fully-retracted key must vanish")

    // a takedown touching NO extreme takes the pure O(delta) append path
    // (no state rewrite): append a middle copy of "a" (25), retract it —
    // min 20 / max 30 hold exactly and the state grows by slices only
    AggState.append(Seq(("a", 25L)).toDF("dig", "pid"), Seq("dig"), "pid", dir)
    val rowsBefore = spark.read.parquet(s"$dir/state").count()
    AggState.retractExact(spark, Seq(("a", 25L)).toDF("dig", "pid"),
      Seq(("a", 20L), ("a", 30L)).toDF("dig", "pid"), Seq("dig"), "pid", dir)
    val m2 = AggState.merged(spark, dir, Seq("dig")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(m2("a") == ((2L, 50L, 20L, 30L)), s"a after mid retract: ${m2.get("a")}")
    assert(spark.read.parquet(s"$dir/state").count() > rowsBefore,
      "extreme-free takedown must append a negated slice, not rewrite the state")
  }

  test("retractHist: histogram counts retract exactly to scratch-on-survivors") {
    val li = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)").as("cents"),
        col("l_orderkey"))
    val dir = tmp(); val scr = tmp()
    AggState.buildHist(li, Seq("l_returnflag"), "cents", dir)
    val deleted = li.filter(col("l_orderkey") % 3 === 1)
    AggState.retractHist(deleted, Seq("l_returnflag"), "cents", dir)
    AggState.buildHist(li.filter(col("l_orderkey") % 3 =!= 1),
      Seq("l_returnflag"), "cents", scr)
    val a = AggState.mergedHist(spark, dir, Seq("l_returnflag"))
    val b = AggState.mergedHist(spark, scr, Seq("l_returnflag"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("KMV distinct state: sliced appends merge to the from-scratch sketch") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    def terms(f: org.apache.spark.sql.Column) = docs.filter(f)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val inc = tmp(); val scr = tmp()
    AggState.buildDistinct(terms(col("doc_id") < 150), Seq("source"), "term", inc)
    AggState.appendDistinct(terms(col("doc_id") >= 150 && col("doc_id") < 350),
      Seq("source"), "term", inc)
    AggState.appendDistinct(terms(col("doc_id") >= 350), Seq("source"), "term", inc)
    AggState.buildDistinct(terms(lit(true)), Seq("source"), "term", scr)
    val a = AggState.mergedDistinct(spark, inc, Seq("source"))
    val b = AggState.mergedDistinct(spark, scr, Seq("source"))
    // bottom-k of a union of bottom-ks == bottom-k of the union: exact
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // estimates are within KMV's expected error of the truth (k=16 →
    // ~26% stderr; assert a loose 3-sigma envelope)
    val exact = terms(lit(true)).distinct().groupBy("source").count()
    val joined = a.join(exact, Seq("source"))
      .select(col("est_distinct").cast("double"), col("count").cast("double"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, n) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(est - n) <= 0.8 * n + 16, s"est $est vs exact $n")
    }
  }

  test("histogram quantile state: sliced appends merge to the from-scratch walk") {
    val li = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)").as("cents"),
        col("l_orderkey"))
    val inc = tmp(); val scr = tmp()
    AggState.buildHist(li.filter(col("l_orderkey") % 2 === 0),
      Seq("l_returnflag"), "cents", inc)
    AggState.appendHist(li.filter(col("l_orderkey") % 2 === 1),
      Seq("l_returnflag"), "cents", inc)
    AggState.buildHist(li, Seq("l_returnflag"), "cents", scr)
    val a = AggState.mergedHist(spark, inc, Seq("l_returnflag"))
    val b = AggState.mergedHist(spark, scr, Seq("l_returnflag"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the estimates bracket the exact percentiles within a bucket width
    // (<= 25%): sanity on p50 vs the true median of cents
    val est = a.select("l_returnflag", "p50_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(cents, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    est.foreach { case (k, p) =>
      assert(p <= exact(k) * 1.05 && p >= exact(k) * 0.7,
        s"$k: p50_est $p vs exact median ${exact(k)}")
    }
  }

  test("streaming foreachBatch appends keep the state recount-exact") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the DedupIndex/CorpusStream discipline applied to aggregates: each
    // micro-batch blindly appends its partials; the merged read must equal
    // a recount over everything ingested so far (integer cents — exact)
    val dir = tmp()
    val seen = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def t(s: String) = Timestamp.valueOf(s)
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val withCents = batch.withColumn("cents",
          expr("CAST(floor(value * 100) AS BIGINT)"))
        if (AggState.exists(dir))
          AggState.append(withCents, Seq("event_type"), "cents", dir)
        else AggState.build(withCents, Seq("event_type"), "cents", dir)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    def check(): Unit = {
      val merged = AggState.merged(spark, dir, Seq("event_type"))
        .select("event_type", "n", "sum")
        .as[(String, Long, Long)].collect()
        .map { case (k, n, s) => k -> (n, s) }.toMap
      val recount = seen.groupBy(_._1).map { case (k, vs) =>
        k -> (vs.size.toLong, vs.map(_._2).sum)
      }
      assert(merged === recount)
    }
    try {
      def add(evs: Ev*): Unit = {
        in.addData(evs: _*)
        q.processAllAvailable()
        seen ++= evs.map(e => e.event_type -> math.floor(e.value * 100).toLong)
      }
      add(Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.25),
        Ev(2, t("2024-01-01 10:01:00"), 2, "view", 2.5))
      check()
      add(Ev(3, t("2024-01-01 10:02:00"), 1, "click", 4.75),
        Ev(4, t("2024-01-01 10:03:00"), 3, "buy", 10.0))
      check()
      add(Ev(5, t("2024-01-01 10:04:00"), 2, "view", 0.01))
      check()
    } finally q.stop()
  }

  // ---- packed Bloom membership state --------------------------------------

  private def tokens(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)

  test("bloom: blind appends fold to the exact from-scratch filter") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val grown = tmp(); val scratch = tmp()
    AggState.buildBloom(tokens(docs.filter(col("doc_id") % 3 === 0)), Nil, "tok", grown)
    AggState.appendBloom(tokens(docs.filter(col("doc_id") % 3 === 1)), Nil, "tok", grown)
    AggState.appendBloom(tokens(docs.filter(col("doc_id") % 3 === 2)), Nil, "tok", grown)
    AggState.buildBloom(tokens(docs), Nil, "tok", scratch)
    val g = AggState.mergedBloom(spark, grown, Nil)
    val s0 = AggState.mergedBloom(spark, scratch, Nil)
    // bitwise OR is associative/commutative/idempotent: any append history
    // folds to the identical packed array
    assert(g.exceptAll(s0).isEmpty && s0.exceptAll(g).isEmpty)
    // and the grown state holds one row per (word, slice) before optimize
    assert(spark.read.parquet(s"$grown/bloom_state").count() > g.count())
  }

  test("bloom: fill monitor reports exact occupancy, monotone under " +
      "appends, saturating at a tiny mBits (the r15 alert hook)") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp()
    AggState.buildBloom(tokens(docs.filter(col("doc_id") % 3 === 0)),
      Nil, "tok", dir)
    val f1 = AggState.bloomFill(spark, dir).head()
    assert(f1.getAs[Long]("m_bits") === AggState.BloomDefaultBits)
    assert(f1.getAs[Int]("k") === AggState.BloomDefaultK)
    val bits1 = f1.getAs[Long]("bits_set")
    assert(bits1 > 0L && bits1 <= AggState.BloomDefaultBits)
    assert(f1.getAs[Long]("fill_bp") ===
      bits1 * 10000L / AggState.BloomDefaultBits)
    // occupancy is monotone under appends (OR never clears a bit)...
    AggState.appendBloom(tokens(docs.filter(col("doc_id") % 3 =!= 0)),
      Nil, "tok", dir)
    val f2 = AggState.bloomFill(spark, dir).head()
    assert(f2.getAs[Long]("bits_set") >= bits1)
    // ...and fp_bp is the stepwise fill^k fold
    val fb = f2.getAs[Long]("fill_bp")
    assert(f2.getAs[Long]("fp_bp") === (fb * fb / 10000L) * fb / 10000L)
    // a deliberately tiny filter reads as saturated — the alert case
    // (the fixture vocabulary is ~60 distinct tokens, so 64 bits land at
    // ~83% fill, far past any sane alert threshold)
    val tiny = tmp()
    AggState.buildBloom(tokens(docs), Nil, "tok", tiny, mBits = 64L)
    val ft = AggState.bloomFill(spark, tiny).head()
    assert(ft.getAs[Long]("fill_bp") > 5000L,
      s"64-bit filter over the corpus should read saturated: $ft")
  }

  test("bloom: no false negatives ever; false positives rare at the default sizing") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp()
    AggState.buildBloom(tokens(docs), Nil, "tok", dir)
    val inserted = tokens(docs).distinct()
    val fn = AggState.bloomMightContain(spark, dir, inserted, Nil, "tok", "might")
      .filter(!col("might")).count()
    assert(fn === 0L) // a set bit is never cleared -> no false negatives
    val absent = spark.range(1000)
      .select(concat(lit("__absent_token_"), col("id")).as("tok"))
    val fp = AggState.bloomMightContain(spark, dir, absent, Nil, "tok", "might")
      .filter(col("might")).count()
    // (1 - e^{-kn/m})^k with n ~ a few hundred distinct tokens, m = 2^20,
    // k = 3 is ~0; allow a loose bound so the assert is sizing, not luck
    assert(fp < 10L, s"bloom FP rate too high: $fp / 1000")
  }

  test("bloom: mBits/k are build knobs persisted in meta and honored by reads") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp()
    AggState.buildBloom(tokens(docs.filter(col("doc_id") < 100)), Nil, "tok",
      dir, mBits = 127L, k = 2)
    assert(AggState.readBloomMeta(dir) === AggState.BloomMeta(127L, 2))
    // append reads the meta, not caller defaults: all words stay < ceil(127/64)
    AggState.appendBloom(tokens(docs.filter(col("doc_id") >= 100)), Nil, "tok", dir)
    val words = AggState.mergedBloom(spark, dir, Nil)
      .agg(max("__word")).head.getLong(0)
    assert(words <= 1L)
    // probes honor the built width too: every inserted token still passes
    val fn = AggState.bloomMightContain(spark, dir, tokens(docs).distinct(),
      Nil, "tok", "might").filter(!col("might")).count()
    assert(fn === 0L)
  }

  test("bloom: keyed filters isolate key groups") {
    val df = spark.createDataFrame(Seq(
      ("en", "hello"), ("en", "world"), ("de", "hallo"))).toDF("lang", "tok")
    val dir = tmp()
    AggState.buildBloom(df, Seq("lang"), "tok", dir)
    val probe = spark.createDataFrame(Seq(
      ("en", "hello"), ("de", "hello"), ("fr", "hello"))).toDF("lang", "tok")
    val got = AggState.bloomMightContain(spark, dir, probe, Seq("lang"), "tok", "might")
      .select("lang", "might").collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("en") === true)   // present under its key
    assert(got("de") === false)  // other key's filter does not leak
    assert(got("fr") === false)  // missing key group screens out
  }

  test("bloom: optimize collapses slice words, preserves the filter, carries meta") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = tmp(); val out = tmp()
    AggState.buildBloom(tokens(docs.filter(col("doc_id") % 2 === 0)), Nil, "tok", dir)
    AggState.appendBloom(tokens(docs.filter(col("doc_id") % 2 === 1)), Nil, "tok", dir)
    val before = AggState.mergedBloom(spark, dir, Nil)
    AggState.optimize(spark, dir, out, Nil)
    val after = AggState.mergedBloom(spark, out, Nil)
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)
    assert(spark.read.parquet(s"$out/bloom_state").count() === after.count())
    assert(AggState.readBloomMeta(out) === AggState.readBloomMeta(dir))
    // the new generation stays appendable (meta travelled with the rewrite)
    AggState.appendBloom(tokens(docs.limit(5)), Nil, "tok", out)
  }

  test("q300 standing DSIR == q296 from-scratch; retraction re-scores to survivors") {
    import graft.queries.TrainPrep
    val sfDir = sf("sf0.001")
    val fromScratch = SparkEntry.queries("q296_dsir_weights")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val standing = SparkEntry.queries("q300_incr_dsir")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(standing == fromScratch, "grown-via-appends must equal from-scratch exactly")

    // retraction: pull one ingested slice back out of the bucket counts —
    // the merged counts must equal a from-scratch aggregate over the
    // survivors (count/sum are group-invertible)
    val dir = tmp()
    val feats = TrainPrep.dsirFeats(
      spark.read.parquet(s"$sfDir/documents.parquet")).persist()
    AggState.build(feats.filter(col("doc_id") % 3 === 0), Seq("bucket"), "tgt", dir)
    AggState.append(feats.filter(col("doc_id") % 3 === 1), Seq("bucket"), "tgt", dir)
    AggState.append(feats.filter(col("doc_id") % 3 === 2), Seq("bucket"), "tgt", dir)
    AggState.retract(feats.filter(col("doc_id") % 3 === 2), Seq("bucket"), "tgt", dir)
    val got = AggState.merged(spark, dir, Seq("bucket"))
      .select(col("bucket"), col("n"), col("sum").cast("long").as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = feats.filter(col("doc_id") % 3 =!= 2)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("tgt").cast("long").as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    feats.unpersist()
    assert(got == want, "post-retraction counts must equal the survivor aggregate")
  }
}
