package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CorpusStream

case class Doc(doc_id: Long, text: String, lang: String, source: String,
               ingest_ts: Timestamp)

/** Streaming corpus intake: the batch curation gates (CorpusMain stages
  * 1/3/4/5) applied to a document stream — watermark-bounded exact dedup,
  * per-row quality/repetition gates, PII scrub. */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private val good = "the quick data row is a fine piece of text " +
    "and it keeps going with more useful words in the table"
  private val loop = ("the " * 20 + "spam " * 20).trim
  private val pii = "the quick data row mail me at bob@corp.example.org " +
    "or call 555-123-4567 about the table of it"

  test("dedup within watermark, quality/repetition gates, PII scrub") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = CorpusStream.curated(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("corpus_in").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00")),
        Doc(2, good, "en", "crawl", t("2024-01-01 10:01:00")), // exact dup
        Doc(3, loop, "en", "crawl", t("2024-01-01 10:02:00")), // repetitive
        Doc(4, "too short", "en", "crawl", t("2024-01-01 10:03:00")),
        Doc(5, pii, "en", "crawl", t("2024-01-01 10:04:00")))
      q.processAllAvailable()
      // a re-crawl of doc 1's text in a later batch, still within the
      // watermark horizon: state drops it
      in.addData(Doc(6, good, "en", "crawl", t("2024-01-01 10:06:00")))
      q.processAllAvailable()
      val rows = spark.table("corpus_in")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(1L, 5L),
        s"expected docs 1 and 5 only, got ${rows.map(_._1).toSeq}")
      val scrubbed = rows.find(_._1 == 5L).get._2
      assert(scrubbed.contains("[EMAIL]") && scrubbed.contains("[PHONE]") &&
        !scrubbed.contains("@") && !scrubbed.contains("555-123-4567"))
      // dedup is stateful, not aggregating: append mode, one state operator
      assert(q.lastProgress.stateOperators.length == 1)
      // observe() funnel rides the batch execution: the last DATA batch
      // held one doc (the re-crawl), which passed the gates and was then
      // dropped by dedup state — n_in == n_gated == 1, output empty.
      // (lastProgress can be a trailing zero-data batch; find the data one.)
      val om = q.recentProgress.filter(_.numInputRows > 0).last.observedMetrics
      assert(om.containsKey("intake") && om.containsKey("gated"),
        s"observed metrics missing: $om")
      assert(om.get("intake").getAs[Long]("n_in") == 1L)
      assert(om.get("gated").getAs[Long]("n_gated") == 1L)
    } finally q.stop()
  }

  test("curated stream ships each kept doc exactly once through the HTTP sink") {
    import java.net.InetSocketAddress
    import java.util.concurrent.ConcurrentHashMap
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val hits = new ConcurrentHashMap[String, Integer]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/ingest", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        hits.merge(ex.getRequestURI.getPath, 1, (a, b) => a + b)
        ex.sendResponseHeaders(200, 0L); ex.close()
      }
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}/ingest"
    val in = MemoryStream[Doc]
    // the full streaming path: curation gates -> stateful dedup -> the
    // same checkpointed HTTP delivery the sync sink uses (K1 streaming)
    val requests = CorpusStream.curated(in.toDF(), watermark = "10 minutes")
      .select(col("doc_id").cast("string").as("node_id"),
        concat(lit(s"$base/"), col("doc_id")).as("url"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_corpus_ckpt").toString
    val q = graft.sinks.HttpSink.streamTo(requests, ckpt, parallelism = 2)
    try {
      in.addData(
        Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00")),
        Doc(2, "too short", "en", "crawl", t("2024-01-01 10:01:00")))
      q.processAllAvailable()
      in.addData(
        Doc(3, good, "en", "crawl", t("2024-01-01 10:02:00")), // dup of 1
        Doc(4, pii, "en", "crawl", t("2024-01-01 10:03:00")))
      q.processAllAvailable()
      assert(hits.getOrDefault("/ingest/1", 0) == 1, s"doc 1: $hits")
      assert(hits.getOrDefault("/ingest/2", 0) == 0, s"junk shipped: $hits")
      assert(hits.getOrDefault("/ingest/3", 0) == 0, s"duplicate shipped: $hits")
      assert(hits.getOrDefault("/ingest/4", 0) == 1, s"doc 4: $hits")
    } finally { q.stop(); server.stop(0) }
  }

  test("near-dup paraphrase arriving in a later batch is dropped via the standing index") {
    implicit val sc = spark.sqlContext
    // a PARAPHRASE of `good`: last word swapped — different digest (exact
    // dedup is blind to it), 3-shingle Jaccard ~0.73 (>= 0.7)
    val paraphrase = good.replaceAll("table$", "ledger")
    val fresh = "a completely different report text about weekly shipment " +
      "volumes and the carriers that move them across the region every day"
    val idxDir = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_out").toString + "/landed"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val in = MemoryStream[Doc]
    val q = CorpusStream.curated(in.toDF(), watermark = "10 minutes")
      .writeStream
      .foreachBatch(CorpusStream.nearDupBatch(idxDir, outDir) _)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val sigsAfterB1 = spark.read.parquet(s"$idxDir/sigs").count()
      assert(sigsAfterB1 == 1L, s"index after batch 1: $sigsAfterB1")
      in.addData(
        Doc(2, paraphrase, "en", "crawl", t("2024-01-01 10:05:00")),
        Doc(3, fresh, "en", "crawl", t("2024-01-01 10:06:00")))
      q.processAllAvailable()
      val landed = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed == Seq(1L, 3L),
        s"paraphrase must be dropped by the index probe, got $landed")
      // the index grew per batch: doc 1, then batch 2's survivor (doc 3)
      val sigs = spark.read.parquet(s"$idxDir/sigs")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(sigs == Seq(1L, 3L), s"index must hold survivors only: $sigs")
    } finally {
      q.stop()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  private val fresh = "a completely different report text about weekly shipment " +
    "volumes and the carriers that move them across the region every day"
  private val fresh2 = "quarterly revenue numbers for the hardware division " +
    "show a steady climb in unit sales across all partner channels this year"

  test("novelty gate: standing bloom drops re-crawls and template remixes across batches") {
    implicit val sc = spark.sqlContext
    // 60 distinct tokens -> 53 distinct 8-grams; a ONE-WORD middle edit
    // changes exactly 8 of them (novel fraction 8/53 ~ 15% < the 30%
    // gate), while a fresh 20-token doc is 100% novel
    val words = (1 to 60).map(i => s"tok$i")
    val long1 = words.mkString(" ")
    val remix = words.updated(29, "swapped").mkString(" ")
    val freshDoc = (1 to 20).map(i => s"new$i").mkString(" ")
    val bloomDir = java.nio.file.Files.createTempDirectory("graft_bloom_gate").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_bloom_out").toString + "/landed"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bloom_ckpt").toString
    val in = MemoryStream[Doc]
    val q = in.toDF().writeStream
      .foreachBatch(CorpusStream.noveltyBatch(bloomDir, outDir) _)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(Doc(1, long1, "en", "crawl", t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData(
        Doc(2, long1, "en", "mirror", t("2024-01-01 10:05:00")),   // exact re-crawl: 0% novel
        Doc(3, remix, "en", "crawl", t("2024-01-01 10:06:00")),    // template remix: ~15% novel
        Doc(4, freshDoc, "en", "crawl", t("2024-01-01 10:07:00")), // 100% novel
        Doc(5, "tiny text", "en", "crawl", t("2024-01-01 10:08:00")), // no 8-gram: admitted
        Doc(7, null, "en", "crawl", t("2024-01-01 10:09:00"))) // null text: no signal, admitted
      q.processAllAvailable()
      val landed = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed == Seq(1L, 4L, 5L, 7L),
        s"bloom gate must drop the re-crawl and the remix, got $landed")
      // the filter grew only by admissions: the remix's 8 novel 8-grams
      // were never folded in, so a THIRD batch repeating the remix still
      // sees them as novel (state holds admitted content only)
      in.addData(Doc(6, remix, "en", "crawl", t("2024-01-01 10:15:00")))
      q.processAllAvailable()
      val landed2 = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed2 == Seq(1L, 4L, 5L, 7L), s"remix must stay dropped: $landed2")
    } finally {
      q.stop()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("bloomBits sizes the novelty filter: a saturated tiny filter " +
      "over-drops novel docs, a sized one admits them (the r15 finding)") {
    // The scale-tier failure mode, pinned at fixture size: the filter is
    // mBits forever, and once fill saturates every genuinely-novel doc
    // reads as seen (false positives push its novel fraction under the
    // gate) — the pipeline keeps "working" while admitting nothing. The
    // knob must make the difference: same feed, tiny vs sized filter.
    def mk(ids: Range, prefix: String): org.apache.spark.sql.DataFrame =
      ids.map(i => Doc(i.toLong,
        (1 to 30).map(j => s"$prefix${i}w$j").mkString(" "),
        "en", "crawl", t("2024-01-01 10:00:00"))).toDF()
    val seed = mk(1 to 10, "a")     // 10 docs x 23 8-grams x k=3 ≈ 690 bits
    val fresh = mk(101 to 110, "b") // entirely new vocabulary: 100% novel
    val tinyDir = java.nio.file.Files.createTempDirectory("bloom_tiny").toString
    val bigDir = java.nio.file.Files.createTempDirectory("bloom_big").toString
    CorpusStream.noveltyAdmit(tinyDir, 3000L, bloomBits = 64L)(seed).count()
    CorpusStream.noveltyAdmit(bigDir, 3000L)(seed).count() // 2^20 default
    val tinyAdmitted =
      CorpusStream.noveltyAdmit(tinyDir, 3000L, bloomBits = 64L)(fresh).count()
    val bigAdmitted = CorpusStream.noveltyAdmit(bigDir, 3000L)(fresh).count()
    assert(bigAdmitted === 10L,
      s"sized filter must admit every genuinely novel doc, got $bigAdmitted")
    assert(tinyAdmitted < bigAdmitted,
      s"saturated 64-bit filter must over-drop ($tinyAdmitted vs $bigAdmitted)")
  }

  test("maintained loop: optimize + publish every N batches, probes survive the swap") {
    import graft.operators.{DedupIndex, Generations}
    val tableDir = java.nio.file.Files.createTempDirectory("graft_gen_tbl").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_gen_out").toString + "/landed"
    def batch(docs: Doc*): org.apache.spark.sql.DataFrame =
      docs.toSeq.toDF().select($"doc_id", $"text", $"lang", $"source", $"ingest_ts")
    val run = CorpusStream.maintainedBatch(tableDir, outDir, optimizeEvery = 2) _
    try {
      // batch 0 creates generation 0 and publishes it
      run(batch(Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00"))), 0L)
      val gen0 = Generations.resolve(tableDir)
      assert(DedupIndex.exists(gen0))
      // batch 1 appends, then the cadence fires: optimize -> NEW
      // generation, atomic publish, old generation retired
      run(batch(Doc(2, fresh, "en", "crawl", t("2024-01-01 10:01:00"))), 1L)
      val gen2 = Generations.resolve(tableDir)
      assert(gen2 != gen0, "optimize cadence did not publish a new generation")
      assert(!new java.io.File(gen0).exists(), "retired generation still on disk")
      // batch 2 probes the NEW generation: a paraphrase of doc 1 (landed
      // two generations ago) is still caught — the swap lost nothing
      val paraphrase = good.replaceAll("table$", "ledger")
      run(batch(
        Doc(3, paraphrase, "en", "crawl", t("2024-01-01 10:02:00")),
        Doc(4, fresh2, "en", "crawl", t("2024-01-01 10:03:00"))), 2L)
      val landed = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed == Seq(1L, 2L, 4L), s"landed $landed")
      val idxIds = DedupIndex.liveIds(spark, Generations.resolve(tableDir))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(idxIds == Seq(1L, 2L, 4L), s"index holds $idxIds")
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("maintained novelty loop: bloom optimize cadence collapses slices, screens survive the swap") {
    import graft.operators.{AggState, Generations}
    val words = (1 to 60).map(i => s"mnt$i")
    val long1 = words.mkString(" ")
    val remix = words.updated(29, "swapped").mkString(" ")
    val tableDir = java.nio.file.Files.createTempDirectory("graft_bloomgen_tbl").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_bloomgen_out").toString + "/landed"
    def batch(docs: Doc*): org.apache.spark.sql.DataFrame =
      docs.toSeq.toDF().select($"doc_id", $"text", $"lang", $"source", $"ingest_ts")
    val run = CorpusStream.maintainedNoveltyBatch(tableDir, outDir, optimizeEvery = 2) _
    try {
      // batch 0 creates + publishes generation 0
      run(batch(Doc(1, long1, "en", "crawl", t("2024-01-01 10:00:00"))), 0L)
      val gen0 = Generations.resolve(tableDir)
      assert(AggState.bloomExists(gen0))
      // batch 1 appends a fresh doc, then the cadence fires: optimize ->
      // new generation, atomic publish, old generation retired
      run(batch(Doc(2, fresh, "en", "crawl", t("2024-01-01 10:01:00"))), 1L)
      val gen2 = Generations.resolve(tableDir)
      assert(gen2 != gen0, "optimize cadence did not publish a new generation")
      assert(!new java.io.File(gen0).exists(), "retired generation still on disk")
      // the collapsed state holds ONE row per word (two slices folded)
      val merged = AggState.mergedBloom(spark, gen2, Nil)
      assert(spark.read.parquet(s"$gen2/bloom_state").count() === merged.count())
      // crash-REPLAY of the cadence batch (publish succeeded, streaming
      // checkpoint did not commit): CURRENT already points at gen-2, so
      // next == gen — the guard must make this a no-op, not an optimize
      // of gen-2 onto itself (which the in-place require refuses, wedging
      // every restart). The replayed doc's n-grams are already in the
      // filter, so it under-admits: landed set unchanged.
      run(batch(Doc(2, fresh, "en", "crawl", t("2024-01-01 10:01:00"))), 1L)
      assert(Generations.resolve(tableDir) == gen2, "replay must not re-publish")
      val afterReplay = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(afterReplay == Seq(1L, 2L), s"replayed batch must under-admit: $afterReplay")
      // batch 2 probes the NEW generation: a remix of doc 1 (folded in two
      // generations ago) is still screened out — the swap lost no bits
      run(batch(
        Doc(3, remix, "en", "crawl", t("2024-01-01 10:02:00")),
        Doc(4, fresh2, "en", "crawl", t("2024-01-01 10:03:00"))), 2L)
      val landed = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed == Seq(1L, 2L, 4L), s"landed $landed")
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("maintained loop drain window: keepLast holds the superseded generation") {
    // the r12 retention knob: a multi-reader deployment passes keepLast/
    // retentionHours so a reader that resolved CURRENT just before the
    // swap keeps its snapshot on disk — default (keepLast=1, 0h) deletes
    // it immediately (previous test); keepLast=2 must keep it resolvable
    import graft.operators.{DedupIndex, Generations}
    val tableDir = java.nio.file.Files.createTempDirectory("graft_drain_tbl").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_drain_out").toString + "/landed"
    def batch(docs: Doc*): org.apache.spark.sql.DataFrame =
      docs.toSeq.toDF().select($"doc_id", $"text", $"lang", $"source", $"ingest_ts")
    val run = CorpusStream.maintainedBatch(tableDir, outDir, optimizeEvery = 2,
      keepLast = 2, retentionHours = 0.0) _
    try {
      run(batch(Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00"))), 0L)
      val gen0 = Generations.resolve(tableDir)
      run(batch(Doc(2, fresh, "en", "crawl", t("2024-01-01 10:01:00"))), 1L)
      val gen2 = Generations.resolve(tableDir)
      assert(gen2 != gen0)
      // the superseded generation survives the swap for the drain window
      assert(new java.io.File(gen0).exists(),
        "keepLast=2 should hold the superseded generation on disk")
      assert(DedupIndex.exists(gen0))
      // and the lineage still resolves it as the as-of read
      assert(Generations.resolveAt(tableDir, 1) == gen0)
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("crash repair: ghost index entries tombstoned, content re-admitted") {
    import graft.operators.DedupIndex
    val idxDir = java.nio.file.Files.createTempDirectory("graft_repair_idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_repair_out").toString + "/landed"
    def batch(docs: Doc*): org.apache.spark.sql.DataFrame =
      docs.toSeq.toDF().select($"doc_id", $"text", $"lang", $"source", $"ingest_ts")
    try {
      // batch 0 lands doc 1 normally
      CorpusStream.nearDupBatch(idxDir, outDir)(
        batch(Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00"))), 0L)
      // CRASH WINDOW: batch 1's survivor (doc 10, fresh text) reached the
      // index append but the sink write was lost
      DedupIndex.append(Seq((10L, fresh)).toDF("doc_id", "text"), idxDir)
      // replay of batch 1: the survivor now matches ITSELF in the index
      // and is dropped — the documented fail-safe under-admission
      CorpusStream.nearDupBatch(idxDir, outDir)(
        batch(Doc(10, fresh, "en", "crawl", t("2024-01-01 10:01:00"))), 1L)
      val landedBefore = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landedBefore == Seq(1L), s"expected under-admission, got $landedBefore")
      // REPAIR: reconcile index vs corpus — doc 10 is a ghost (indexed,
      // never landed); it gets tombstoned so its content is admittable again
      assert(CorpusStream.repairIndex(spark, idxDir, outDir) === 1L)
      // the re-crawl returns under a fresh ingest id and now lands
      CorpusStream.nearDupBatch(idxDir, outDir)(
        batch(Doc(11, fresh, "en", "crawl", t("2024-01-01 10:05:00"))), 2L)
      val landedAfter = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landedAfter == Seq(1L, 11L), s"repair did not re-admit: $landedAfter")
      // idempotent: a second repair finds nothing (11 landed, 10 tombstoned)
      assert(CorpusStream.repairIndex(spark, idxDir, outDir) === 0L)
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("standing clusters fold forward across stream batches (archive shape)") {
    import graft.operators.ClusterState
    val idxDir = java.nio.file.Files.createTempDirectory("graft_cl_idx").toString
    val clDir = java.nio.file.Files.createTempDirectory("graft_cl_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cl_out").toString + "/landed"
    def batch(docs: Doc*): org.apache.spark.sql.DataFrame =
      docs.toSeq.toDF().select($"doc_id", $"text", $"lang", $"source", $"ingest_ts")
    def labels(): Map[Long, Long] =
      if (!ClusterState.exists(clDir)) Map.empty
      else ClusterState.clusters(spark, clDir).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    val run = CorpusStream.clusterBatch(idxDir, clDir, outDir) _
    try {
      // batch 0: two unrelated docs — admitted, indexed, no clusters yet
      run(batch(Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00")),
        Doc(10, fresh, "en", "crawl", t("2024-01-01 10:00:30"))), 0L)
      assert(labels() === Map.empty, "unrelated docs must not cluster")
      // batch 1: a paraphrase of doc 1 — probe edge 2—1 opens cluster {1,2}
      val para1 = good.replaceAll("table$", "ledger")
      run(batch(Doc(2, para1, "en", "crawl", t("2024-01-01 10:01:00"))), 1L)
      assert(labels() === Map(1L -> 1L, 2L -> 1L), s"got ${labels()}")
      // batch 2: another paraphrase of doc 1 (different edit) — its probe
      // edge folds into the STANDING cluster, label stays the global min
      val para2 = good.replaceAll("quick", "speedy")
      run(batch(Doc(3, para2, "en", "crawl", t("2024-01-01 10:02:00"))), 2L)
      assert(labels() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got ${labels()}")
      // the archive admitted EVERYTHING — dup tracking never drops
      val landed = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed == Seq(1L, 2L, 3L, 10L), s"archive must admit all: $landed")
      // the index holds all four (probes of later batches see every copy)
      val sigs = spark.read.parquet(s"$idxDir/sigs")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(sigs == Seq(1L, 2L, 3L, 10L), s"index must hold all: $sigs")
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }
}
