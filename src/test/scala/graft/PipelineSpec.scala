package graft

import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.operators.{ClusterState, DedupIndex, Generations}
import graft.streaming.CorpusStream

/** The end-to-end curation pipeline (PipelineMain's wiring): a directory
  * feed drained with AvailableNow through curated() into pipelineBatch —
  * novelty gate, standing near-dup index, standing dup clusters, corpus
  * append, generation maintenance — across TWO invocations with a shared
  * checkpoint (the cron shape: run two processes only the delta). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val good = "the quick data row is a fine piece of text " +
    "and it keeps going with more useful words in the table"
  private val freshA = "a curious model reads the long corpus and it " +
    "notes every rare word while the index stays small in memory"
  private val fresh2 = "soon the planner picks a narrow scan of the " +
    "bright column store and every shuffle stays tiny under it"

  test("directory feed -> gated, deduped, clustered, published corpus across two runs") {
    val root = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val inDir = s"$root/in"
    val pipe = s"$root/pipe"
    val bloomTable = s"$pipe/bloom"
    val indexTable = s"$pipe/index"
    val clusterDir = s"$pipe/clusters"
    val corpusDir = s"$pipe/corpus"

    def writeWave(docs: Doc*): Unit =
      docs.toSeq.toDF().coalesce(1).write.mode("append").parquet(inDir)

    def drain(): Unit = {
      val schema = spark.read.parquet(inDir).schema
      val feed = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val q = CorpusStream.curated(feed).writeStream
        .option("checkpointLocation", s"$pipe/checkpoint")
        .foreachBatch(CorpusStream.pipelineBatch(bloomTable, indexTable,
          clusterDir, corpusDir, optimizeEvery = 1) _)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    try {
      // ---- wave 1: one file = one batch --------------------------------
      // 1 good (lands), 2 exact dup (curated's digest dedup), 3 freshA
      // (lands), 4 paraphrase of freshA in the SAME batch (within-batch
      // LSH pair: dropped, edge recorded)
      writeWave(
        Doc(1, good, "en", "crawl", t("2024-01-01 10:00:00")),
        Doc(2, good, "en", "crawl", t("2024-01-01 10:01:00")),
        Doc(3, freshA, "en", "crawl", t("2024-01-01 10:02:00")),
        Doc(4, freshA.replaceAll("memory$", "cache"), "en", "crawl",
          t("2024-01-01 10:03:00")))
      drain()
      val landed1 = spark.read.parquet(corpusDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed1 == Seq(1L, 3L), s"wave 1 landed $landed1")
      // both standing tables published + the optimize cadence rotated
      // them at least once (optimizeEvery = 1)
      val bloomGen1 = Generations.resolve(bloomTable)
      val indexGen1 = Generations.resolve(indexTable)
      assert(DedupIndex.exists(indexGen1))
      // the within-batch near-dup edge is in the standing clusters
      val c1 = ClusterState.clusters(spark, clusterDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(c1.keySet == Set(3L, 4L), s"wave 1 clusters hold ${c1.keySet}")
      assert(c1(3L) == c1(4L), "paraphrase pair not in one cluster")

      // ---- wave 2: a new file after a restart (checkpoint resumes) -----
      // 6 template remix of doc 1 (mostly-seen 8-grams -> novelty gate
      // drops it BEFORE any index probe), 7 paraphrase of doc 1 with a
      // MIDDLE-token edit — the edit position is load-bearing both ways:
      // it flips 8 of the 14 8-gram windows novel (5714 bp >= the 3000 bp
      // gate) while changing only 3 of the 19 3-token shingles (J = 16/22
      // = 0.727 >= 0.7, so the standing index probe catches it; a
      // LAST-token edit would flip only ONE window, 714 bp, and die at
      // the novelty gate before any probe) — then 8 fresh (lands)
      writeWave(
        Doc(6, good + " plus tail", "en", "crawl", t("2024-01-01 11:00:00")),
        Doc(7, good.replaceAll("text", "prose"), "en", "crawl",
          t("2024-01-01 11:01:00")),
        Doc(8, fresh2, "en", "crawl", t("2024-01-01 11:02:00")))
      drain()
      val landed2 = spark.read.parquet(corpusDir)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(landed2 == Seq(1L, 3L, 8L), s"wave 2 landed $landed2")
      // doc 7's near-dup edge to doc 1 joined the standing clusters
      val c2 = ClusterState.clusters(spark, clusterDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(c2.keySet == Set(1L, 3L, 4L, 7L), s"wave 2 clusters ${c2.keySet}")
      assert(c2(1L) == c2(7L) && c2(3L) == c2(4L) && c2(1L) != c2(3L))
      // generation maintenance kept rotating: wave 2 published NEW
      // generations and retired the superseded ones (keepLast = 1)
      val bloomGen2 = Generations.resolve(bloomTable)
      val indexGen2 = Generations.resolve(indexTable)
      assert(bloomGen2 != bloomGen1 && indexGen2 != indexGen1,
        "optimize cadence did not rotate the generations")
      assert(!new java.io.File(bloomGen1).exists(),
        "superseded bloom generation still on disk")
      // the index's live ids track the corpus exactly
      val idxIds = DedupIndex.liveIds(spark, indexGen2)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(idxIds == Seq(1L, 3L, 8L), s"index holds $idxIds")

      // ---- rerun with nothing new: a no-op -----------------------------
      drain()
      val landed3 = spark.read.parquet(corpusDir).count()
      assert(landed3 == 3L, s"no-op rerun changed the corpus: $landed3 rows")
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }
}
