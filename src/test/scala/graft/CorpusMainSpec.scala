package graft

import org.apache.spark.sql.functions._

/** The corpus-curation pipeline: funnel monotonicity, dedup behavior on
  * injected duplicates, and the partitioned curated output. */
class CorpusMainSpec extends SparkSpec {
  import spark.implicits._

  test("funnel drops injected exact and near duplicates, keeps first") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    // inject: an exact copy of doc 0 (id 90000) and a shifted near-copy
    // of doc 1 (id 90001) that shares almost all 3-shingles
    val d0 = docs.filter(col("doc_id") === 0).select("text").as[String].first()
    val d1 = docs.filter(col("doc_id") === 1).select("text").as[String].first()
    val near = d1.split("\\s+").dropRight(1).mkString(" ") + " zzz"
    val injected = docs.unionByName(
      Seq((90000L, d0, "en", "inj", d0.length.toLong),
        (90001L, near, "en", "inj", near.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))

    val (curated, funnel, release) = CorpusMain.curate(spark, injected)
    val f = funnel.toMap
    assert(f("input") == docs.count() + 2)
    // the exact copy is gone (keep-first kept doc 0)
    assert(f("exact_dedup") <= f("input") - 1)
    assert(f("near_dedup") <= f("exact_dedup"))
    assert(f("quality") <= f("near_dedup") && f("quality") > 0)
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(90000L), "exact duplicate survived")
    assert(ids.contains(0L) && ids.contains(1L), "keep-first originals dropped")
    assert(!ids.contains(90001L), "near duplicate survived")
    release()
  }

  test("transitive near-dup chain collapses to ONE kept doc (the cluster min)") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val d1 = docs.filter(col("doc_id") === 1).select("text").as[String].first()
    val words = d1.split("\\s+")
    // a chain: d1 ~ nearA (one tail word changed) ~ nearB (two changed) —
    // nearB shares enough shingles with nearA to pair, and the pairwise
    // (1,nearA),(nearA,nearB) edges must close into one cluster keeping 1
    val nearA = (words.dropRight(1) :+ "zzz").mkString(" ")
    val nearB = (words.dropRight(2) :+ "zzz" :+ "yyy").mkString(" ")
    val injected = docs.unionByName(
      Seq((91001L, nearA, "en", "inj", nearA.length.toLong),
        (91002L, nearB, "en", "inj", nearB.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val (curated, funnel, release) = CorpusMain.curate(spark, injected)
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L), "cluster minimum dropped")
    assert(!ids.contains(91001L) && !ids.contains(91002L),
      "transitive near-duplicates survived cluster closure")
    val f = funnel.toMap
    assert(f("near_dup_clusters") >= 1 && f("largest_cluster") >= 3)
    release()
  }

  test("keep=longest survivorship keeps the best copy, not the smallest id") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val d1 = docs.filter(col("doc_id") === 1).select("text").as[String].first()
    // the injected near-dup is one word LONGER than doc 1: default keep-min
    // keeps 1; keep=longest must keep the injected doc instead
    val longer = d1 + " zzz"
    val injected = docs.unionByName(
      Seq((92001L, longer, "en", "inj", longer.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))

    val (curMin, _, relMin) = CorpusMain.curate(spark, injected)
    val idsMin = curMin.select("doc_id").as[Long].collect().toSet
    assert(idsMin.contains(1L) && !idsMin.contains(92001L),
      "default survivorship no longer keep-min")
    relMin()

    val (curLong, _, relLong) =
      CorpusMain.curate(spark, injected, keepLongest = true)
    val idsLong = curLong.select("doc_id").as[Long].collect().toSet
    assert(idsLong.contains(92001L) && !idsLong.contains(1L),
      "keep=longest did not keep the longest cluster member")
    relLong()
  }

  test("paraexact stage trims cross-doc repeated paragraphs keep-first; untouched docs verbatim") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val pA = "the quick data row is a fine piece of text and it keeps going"
    val pC = "soon the planner picks a narrow scan of the bright column store"
    // 93000 carries [A, C]; 93001 carries [A] inside ITS OWN fresh text —
    // A repeats across the two (keep-first keeps 93000's copy: lower pid),
    // while whole-doc digests and shingle sets differ enough that neither
    // exact-doc nor near-dup dedup touches the pair
    val tail = "yet every broker holds a steady queue of small parts under it"
    val injected = docs.unionByName(
      Seq((93000L, s"$pA\n\n$pC", "en", "inj", 1L),
        (93001L, s"$pA\n\n$tail", "en", "inj", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val (curated, funnel, release) =
      CorpusMain.curate(spark, injected, paraExactGate = true)
    val f = funnel.toMap
    assert(f.contains("exact_para_trim") && f("exact_para_trim") <= f("exact_dedup"))
    val rows = curated.filter(col("doc_id") >= 93000L)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set(93000L, 93001L), s"kept ${rows.keySet}")
    // the first copy's doc is untouched (verbatim, original casing and
    // separator); the second loses A and is rebuilt from its kept paragraph
    assert(rows(93000L) == s"$pA\n\n$pC", s"doc 93000: '${rows(93000L)}'")
    assert(rows(93001L) == tail.toLowerCase, s"doc 93001: '${rows(93001L)}'")
    release()
  }

  test("repetition gate drops generator loops; PII is scrubbed; split attached") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    // a 40-token single-word loop: dup_token_frac ≈ 0.975 — the q80 gate's
    // canonical victim (it passes the q31 gate if we give it stopwords)
    val loop = ("the " * 20 + "spam " * 20).trim
    val pii = "the quick data row mail me at bob@corp.example.org " +
      "or call 555-123-4567 about the table of it"
    val injected = docs.unionByName(
      Seq((92000L, loop, "en", "inj", loop.length.toLong),
        (92001L, pii, "en", "inj", pii.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val (curated, funnel, release) = CorpusMain.curate(spark, injected)
    val f = funnel.toMap
    val rows = curated.select("doc_id", "text", "split").collect()
    val ids = rows.map(_.getLong(0)).toSet
    assert(!ids.contains(92000L), "repetitive doc survived the q80 gate")
    assert(f("repetition") <= f("quality"))
    assert(f("pii_redacted") >= 1L)
    val scrubbed = rows.find(_.getLong(0) == 92001L).map(_.getString(1))
    assert(scrubbed.exists(t => t.contains("[EMAIL]") && t.contains("[PHONE]")
      && !t.contains("@") && !t.contains("555-123-4567")), s"got $scrubbed")
    // split is the q73 content-independent assignment
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
    release()
  }

  test("decontam drops the train doc that 8-gram-overlaps a heldout doc") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    // ids chosen by the q73 bucket formula: 93000 -> train, 93027 -> test.
    // The two docs differ except for a 15-token common run: 3-shingle
    // Jaccard ~0.18 (passes the near-dup gate) but 8/37 of the train doc's
    // 8-grams hit the heldout set (>= 10% -> decontaminated).
    val common = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar"
    val trainDoc = "the " + (1 to 28).map(i => s"tr$i").mkString(" ") + " " + common
    val testDoc = "the " + (1 to 28).map(i => s"te$i").mkString(" ") + " " + common
    val injected = docs.unionByName(
      Seq((93000L, trainDoc, "en", "inj", trainDoc.length.toLong),
        (93027L, testDoc, "en", "inj", testDoc.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))

    val (plain, fPlain, relPlain) = CorpusMain.curate(spark, injected)
    val plainIds = plain.select("doc_id").as[Long].collect().toSet
    assert(plainIds.contains(93000L) && plainIds.contains(93027L),
      "both synthetic docs must survive every gate when decontam is off")
    assert(!fPlain.toMap.contains("decontam"))
    relPlain()

    val (cur, funnel, release) = CorpusMain.curate(spark, injected, decontam = true)
    val rows = cur.select("doc_id", "split").collect()
    val ids = rows.map(_.getLong(0)).toSet
    assert(!ids.contains(93000L), "contaminated train doc survived decontam")
    assert(ids.contains(93027L), "heldout doc must be kept")
    assert(rows.find(_.getLong(0) == 93027L).get.getString(1) == "test")
    val f = funnel.toMap
    assert(f("decontam") < (if (f.contains("lm_gate")) f("lm_gate") else f("repetition")))
    release()
  }

  test("funnel counts reuse persisted stages; release() frees them") {
    val (curated, _, release) = CorpusMain.curate(spark, Tables(spark, sf("sf0.001"), "documents"))
    // downstream of the funnel, curated must read the persisted near-dedup
    // stage, not re-execute the dedup pipeline
    val plan = curated.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), s"curated does not reuse the stage cache:\n$plan")
    release()
    // curate + release leave no persisted RDDs behind (the round-2 leak:
    // minhashBase stayed cached for the life of the session). localCheckpoint
    // blocks (the boilerplate drop list) are reclaimed by the ContextCleaner
    // once unreferenced — not a leak (see verify notes).
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.toString.contains("localCheckpoint"))
    assert(leaked.isEmpty, s"leaked caches: ${leaked.mkString(", ")}")
  }

  test("optional LM gate keeps exactly the docs scoring at/above the threshold") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    // fit the same LM the gate will see (the post-repetition survivors) and
    // derive the expected kept set independently of the pipeline
    val (pre, _, release0) = CorpusMain.curate(spark, docs)
    val survivorIds = pre.select("doc_id").as[Long].collect().toSet
    val scores = graft.queries.Text.lmScore(
        docs.filter(col("doc_id").isInCollection(survivorIds)))
      .select("doc_id", "avg_lnp_e6").as[(Long, Long)].collect().toMap
    release0()
    // median score as the gate: strictly above the minimum, so the gate
    // provably drops something and keeps something
    val sorted = scores.values.toSeq.sorted
    val threshold = sorted(sorted.size / 2)
    val expectedKept = survivorIds.filter(id =>
      scores.get(id).forall(_ >= threshold)) // unscored (short) docs pass

    val (curated, funnel, release) = CorpusMain.curate(spark, docs, Some(threshold))
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(ids == expectedKept, "gate kept a different set than the score table implies")
    assert(ids.size < survivorIds.size, "gate dropped nothing")
    assert(funnel.toMap.apply("lm_gate") == ids.size)
    release()
    // localCheckpoint blocks (the small lmScore output) are reclaimed by
    // the ContextCleaner, not unpersist — the established q85/PrefixSum
    // pattern; only true cache leaks fail here
    val leaked = spark.sparkContext.getPersistentRDDs
      .filterNot(_._2.toString.contains("localCheckpoint"))
    assert(leaked.isEmpty, s"leaked caches: $leaked")
  }

  test("boilerplate gate drops a template family that slips both dedups") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    // six instances of one template: a 30-token shared block + a unique
    // 10-token tail. Pairwise shingle Jaccard ≈ 28/(38+38-28) ≈ 0.58 —
    // UNDER the 0.7 near-dup gate — but >70% of each doc's 3-grams are
    // shared by all six (df ≥ 5), so the boilerplate share gate fires.
    val block = (1 to 30).map(i => s"tpl$i").mkString(" ")
    val family = (0 until 6).map { k =>
      val tail = (1 to 10).map(i => s"u${k}x$i").mkString(" ")
      // stopwords so the q31 quality gate passes
      (93000L + k, s"the of and is a it in to $block $tail", "en", "tpl",
        (block.length + tail.length).toLong)
    }
    val injected = docs.unionByName(
      family.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val (curated, funnel, release) = CorpusMain.curate(spark, injected)
    val f = funnel.toMap
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    // the family survives both dedups (no pair reaches 0.7) and is then
    // removed WHOLESALE by the boilerplate stage. Had near-dedup caught it
    // instead, its cluster minimum would have been kept — and with the
    // family gone, that survivor's grams would fall under df >= 5 and
    // pass the boilerplate gate — so all-six-absent proves the path.
    assert((93000L to 93005L).forall(id => !ids.contains(id)),
      "template instances survived the boilerplate gate")
    assert(f("boilerplate") <= f("repetition") - 6)
    release()
  }

  test("domain-mix report over the curated set is internally consistent") {
    val (curated, funnel, release) = CorpusMain.curate(spark, Tables(spark, sf("sf0.001"), "documents"))
    val mix = graft.queries.TrainPrep.domainMix(curated).collect()
    assert(mix.nonEmpty)
    // doc accounting: the mix report covers exactly the final funnel stage
    assert(mix.map(_.getLong(1)).sum == funnel.toMap.apply("boilerplate"))
    // shares: descending by volume, cumulative monotone, final cum = 100%
    val tokens = mix.map(_.getLong(2))
    assert(tokens.zip(tokens.tail).forall { case (a, b) => a >= b })
    val cums = mix.map(_.getLong(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last == 10000L, s"final cum_share_bp ${cums.last}")
    release()
  }

  test("curated output writes lang-partitioned parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val (curated, _, release) = CorpusMain.curate(spark, Tables(spark, sf("sf0.001"), "documents"))
    curated.write.mode("overwrite").partitionBy("lang").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("lang="))
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(out)
    assert(back.count() == curated.count())
    release()
  }

  test("publish gate passes a real build and flags each doctored violation") {
    val (curated, _, release) = CorpusMain.curate(spark, Tables(spark, sf("sf0.001"), "documents"))
    assert(CorpusMain.publishGate(curated).forall(_._2 == 0L))
    // doctor the artifact: an exact duplicate, an unscrubbed PII doc, a
    // bogus split tag — each check must count its own violation
    val doctored = curated.unionByName(
      curated.limit(1).withColumn("doc_id", col("doc_id") + 900000L))
      .unionByName(curated.limit(1)
        .withColumn("doc_id", col("doc_id") + 900001L)
        .withColumn("text", lit("contact me at leaked@example.com please"))
        .withColumn("split", lit("shadow")))
    val gate = CorpusMain.publishGate(doctored).toMap
    assert(gate("unique_digest") >= 1L, gate.toString)
    assert(gate("pii_scrubbed") === 1L, gate.toString)
    assert(gate("valid_split") === 1L, gate.toString)
    release()
  }
}
