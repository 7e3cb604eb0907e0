package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AggState, ClusterState, DedupIndex, Generations, Takedown}
import graft.streaming.CorpusStream

/** End-to-end corpus takedown (r18): one request removes a doc from the
  * corpus store, the standing near-dup index, the dup clusters and the
  * exact-paragraph digest state — and, with `rebloom`, a re-crawl of the
  * removed content is re-ADMITTED end to end (the whole point of
  * retracting state instead of letting it go stale). */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val pA = "the quick data row is a fine piece of text and it keeps going"
  private val pB = "a curious model reads the long corpus and it notes every rare word"
  private val pC = "soon the planner picks a narrow scan of the bright column store"
  // doc 3/4 near-dup pair built AROUND the exact-paragraph trim: the two
  // docs must share NO identical paragraph (a shared block/paragraph
  // would be trimmed from doc 4 before LSH sees it, destroying the pair
  // — the exact-first stage deduplicates content the near-dup path then
  // never pairs on) yet pair DETERMINISTICALLY (4×4 banding misses
  // J = 0.8 content ~12% of the time — measured the hard way). Solution:
  // the SAME 20-token sequence with different paragraph BREAKS — shingle
  // sets identical (J = 1, every band matches), while doc 3's fallback
  // blocks (1-16, 17-20) and doc 4's boundary paragraphs (1-10, 11-20)
  // share no digest
  private val freshA = "a curious model walks the long corpus and it notes " +
    "every rare word while the index stays small in memory"
  private val freshAEdit = "a curious model walks the long corpus and it " +
    "notes\n\nevery rare word while the index stays small in memory"
  private val fresh2 = "every morning the analyst opens a clean report and " +
    "the numbers line up in a tidy view for it"

  test("takedown removes everywhere; rebloom re-admits a re-crawl of the removed content") {
    val root = java.nio.file.Files.createTempDirectory("graft_takedown").toString
    val pipe = s"$root/pipe"
    val (bloomT, indexT, clusterD, corpusD, paraT) =
      (s"$pipe/bloom", s"$pipe/index", s"$pipe/clusters", s"$pipe/corpus",
        s"$pipe/para")
    def batch(id: Long, docs: Doc*): Unit =
      CorpusStream.pipelineBatch(bloomT, indexT, clusterD, corpusD,
        optimizeEvery = 100, paraTable = paraT)(docs.toSeq.toDF(), id)

    // batch 0: doc 1 = [A, B]; doc 3 fresh; doc 4 = paraphrase of doc 3
    // (within-batch near-dup: dropped, cluster {3,4} recorded); doc 5 fresh
    batch(0L,
      Doc(1, s"$pA\n\n$pB", "en", "crawl", t("2024-01-01 10:00:00")),
      Doc(3, freshA, "en", "crawl", t("2024-01-01 10:01:00")),
      Doc(4, freshAEdit, "en", "crawl", t("2024-01-01 10:02:00")),
      Doc(5, fresh2, "en", "crawl", t("2024-01-01 10:03:00")))
    def corpusIds: Set[Long] = spark.read.parquet(corpusD)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds == Set(1L, 3L, 5L), s"batch 0 landed $corpusIds")

    // batch 1: doc 2 = [A, C] — A trims on second sight, doc 2 lands as C
    batch(1L, Doc(2, s"$pA\n\n$pC", "en", "crawl", t("2024-01-01 11:00:00")))
    assert(corpusIds == Set(1L, 3L, 5L, 2L), s"setup landed $corpusIds")
    val c0 = ClusterState.clusters(spark, clusterD)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c0.keySet == Set(3L, 4L) && c0(3L) == c0(4L), s"setup clusters $c0")

    // ---- DRY-RUN: full accounting, zero mutation -----------------------
    val p = Takedown.plan(spark, pipe, Seq(1L, 3L).toDF("doc_id"))
    // doc 1 holds paragraphs A+B; doc 3 (20 tokens, no blank line) holds
    // two 16-token fallback blocks
    assert(p.requested == 2 && p.corpusRemoved == 2 && p.corpusLeft == 2)
    assert(p.paraDigestsRetracted == 4, s"plan: $p")
    assert(corpusIds == Set(1L, 3L, 5L, 2L), "dry-run mutated the corpus")

    // ---- APPLY with rebloom --------------------------------------------
    val r = Takedown.apply(spark, pipe, Seq(1L, 3L).toDF("doc_id"),
      rebloom = true)
    assert(r.corpusRemoved == 2 && r.corpusLeft == 2 && r.indexTombstoned &&
      r.clustersUpdated && r.paraDigestsRetracted == 4 && r.bloomRebuilt,
      s"apply: $r")
    assert(corpusIds == Set(2L, 5L))
    // the index answers only for the survivors
    val live = DedupIndex.liveIds(spark, Generations.resolve(indexT))
      .collect().map(_.getLong(0)).toSet
    assert(live == Set(2L, 5L), s"index live ids $live")
    // removing cluster member 3 leaves 4 alone — both drop (clusters >= 2)
    val c1 = ClusterState.clusters(spark, clusterD)
      .collect().map(_.getLong(0)).toSet
    assert(!c1.contains(3L) && !c1.contains(4L), s"clusters after: $c1")
    // para state digests == exactly the surviving corpus's paragraphs
    val paraGen = Generations.resolve(paraT)
    val stateDigs = AggState.merged(spark, paraGen, Seq("dig"))
      .select("dig").collect().map(_.getString(0)).toSet
    val scratchDigs = graft.queries.Dedup.paraDigested(
        spark.read.parquet(corpusD).select("doc_id", "text"))
      .select("dig").distinct().collect().map(_.getString(0)).toSet
    assert(stateDigs == scratchDigs && stateDigs.size == 3,
      s"state ${stateDigs.size} vs scratch ${scratchDigs.size}")

    // ---- the payoff: a re-crawl of the removed content is re-admitted --
    batch(2L, Doc(9, s"$pA\n\n$pB", "en", "crawl", t("2024-01-01 12:00:00")))
    assert(corpusIds == Set(2L, 5L, 9L),
      "re-crawled content stayed suppressed after takedown+rebloom")
    val kept9 = spark.read.parquet(corpusD)
      .filter(col("doc_id") === 9L).select("text").head().getString(0)
    assert(kept9 == s"$pA\n\n$pB", "re-crawl was trimmed against retracted state")

    // re-running the same takedown is a harmless no-op on the merged view
    val r2 = Takedown.apply(spark, pipe, Seq(1L, 3L).toDF("doc_id"))
    assert(r2.corpusRemoved == 0 && corpusIds == Set(2L, 5L, 9L))
    val stateAfter = AggState.merged(spark, Generations.resolve(paraT),
      Seq("dig")).select("dig").collect().map(_.getString(0)).toSet
    assert(stateAfter.size == 5, s"rerun broke the digest view: $stateAfter")
  }
}
