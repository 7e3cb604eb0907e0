package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** The LLM-corpus curation pipeline as ONE runnable job — the
  * training-data operators (builder brief) composed the way a real corpus
  * build uses them:
  *
  * ```
  * runMain graft.CorpusMain <sfDir> <outDir>
  * ```
  *
  *  1. exact dedup — hash-groupBy on the content digest, keep min doc_id;
  *  2. near-dup removal — MinHash+LSH candidates (one corpus scan, capped
  *     buckets), Jaccard-verified ≥ 0.7; of each near-dup pair the larger
  *     doc_id is dropped (keep-first, matching exact dedup's keep rule);
  *  3. quality gate — token count ≥ 10 and stopword ratio ≥ 0.01 (the
  *     q31 scoring signals);
  *  4. curated write — parquet partitioned by `lang`, so per-language
  *     training reads prune partitions.
  *
  * Every stage is a DataFrame transform over the SAME operators the
  * oracle-verified queries use (q35/q37/q31 logic); the pipeline adds only
  * composition. At 100 TB: stage 1 is one digest shuffle, stage 2 is the
  * linear LSH path (base table persisted once), stage 3 is per-row, and
  * the final write is partition-parallel — no driver-side iteration
  * anywhere. Prints a per-stage row-count funnel (the curation report).
  */
object CorpusMain {

  /** Returns (curated docs, stage funnel). Separated from main for tests. */
  def curate(spark: SparkSession, docs: DataFrame): (DataFrame, Seq[(String, Long)]) = {
    val total = docs.count()

    // 1. exact dedup: keep the smallest doc_id per content digest
    val keepExact = docs
      .withColumn("text_hash", md5(lower(trim(col("text"))).cast("binary")))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("text_hash", "keep_id")
    val nExact = keepExact.count()

    // 2. near-dup removal: LSH pairs (d1 < d2) -> drop every d2
    val base = Dedup.minhashBase(keepExact)
    val dropIds = Dedup.lshPairs(base, Dedup.LshBucketCap)
      .select(col("d2").as("doc_id")).distinct()
    val nearDeduped = keepExact.join(dropIds, Seq("doc_id"), "left_anti")
    val nNear = nearDeduped.count()

    // 3. quality gate: q31's signals as a filter
    val toks = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(col("text"))), "\\s+"))
    val stopwords = array(Seq("the", "a", "of", "and", "to", "in", "is", "it").map(lit): _*)
    val curated = nearDeduped
      .withColumn("w", toks)
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("stop_ratio",
        size(filter(col("w"), t => array_contains(stopwords, t))).cast("double") /
          greatest(col("n_tokens").cast("double"), lit(1.0)))
      .filter(col("n_tokens") >= 10 && col("stop_ratio") >= 0.01)
      .drop("w")
    val nCurated = curated.count()

    (curated, Seq(
      "input" -> total, "exact_dedup" -> nExact,
      "near_dedup" -> nNear, "quality" -> nCurated))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CorpusMain <sfDir> <outDir>")
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (curated, funnel) = curate(spark, Tables(spark, args(0), "documents"))
    curated.write.mode("overwrite").partitionBy("lang").parquet(args(1))
    funnel.foreach { case (stage, n) => println(s"$stage: $n") }
    spark.stop()
  }
}
