package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Redaction

/** The corpus-curation gates as a STREAMING intake — the shape a crawler
  * feed takes before it lands in the corpus store, mirroring CorpusMain's
  * batch funnel stage for stage where streaming semantics allow:
  *
  *  - exact dedup → `dropDuplicatesWithinWatermark` on the content digest:
  *    state holds one digest per unique doc inside the watermark horizon
  *    (exactly-bounded memory), so a re-crawled page is dropped while its
  *    first copy is still in horizon. Corpus-wide dedup across horizons
  *    stays a batch job (CorpusMain) — unbounded digest state in a stream
  *    is the design error, not an option;
  *  - quality + repetition gates (q31/q80 signals) are per-row — identical
  *    expressions to the batch funnel;
  *  - PII scrub (q81's operator) is per-row.
  *
  * Near-dup LSH clustering is deliberately NOT here: candidate pairing
  * needs the corpus-wide bucket state, which is a batch/compaction concern
  * (run CorpusMain over the landed files); a streaming approximation would
  * silently miss pairs straddling micro-batches.
  */
object CorpusStream {

  private def toks(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(c)), "\\s+"))

  private val stopwords =
    array(Seq("the", "a", "of", "and", "to", "in", "is", "it").map(lit): _*)

  // repetition fractions via the native one-pass NgramDistincts expression
  // (same gate as CorpusMain stage 4 / q80)
  private def frac(total: Column, distinct: Column): Column =
    when(total === 0, lit(0.0))
      .otherwise(lit(1.0) - distinct.cast("double") / total.cast("double"))

  /** `docs` must carry (doc_id, text, lang, source, ingest_ts TIMESTAMP).
    * Returns the curated stream: quality + repetition gates, then
    * watermark-bounded exact dedup, then the scrub. The per-row gates run
    * BEFORE the stateful dedup on purpose: junk never enters the digest
    * state, so state size is the in-horizon count of PASSING docs (the
    * kept set is identical either way — both orders keep the first copy
    * of a passing text). Append-mode safe (no aggregation). */
  def curated(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      // per-batch funnel via observe(): the counts ride the batch's own
      // execution (StreamingQueryProgress.observedMetrics) — no second
      // pass, the streaming analog of CorpusMain's staged funnel
      .observe("intake", count(lit(1)).as("n_in"))
      .withColumn("w", toks(col("text")))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .filter(col("n_tokens") >= 10 &&
        size(filter(col("w"), t => array_contains(stopwords, t))).cast("double") /
          greatest(col("n_tokens").cast("double"), lit(1.0)) >= 0.01)
      .withColumn("d", org.apache.spark.sql.graft.TextHashes.ngram_distincts(col("w")))
      .filter(!(frac(col("n_tokens"), col("d.d_tok")) > 0.8 ||
        frac(greatest(col("n_tokens") - 2, lit(0L)), col("d.d_3g")) > 0.3))
      .drop("d")
      .observe("gated", count(lit(1)).as("n_gated"))
      .withColumn("text_hash", md5(lower(trim(col("text"))).cast("binary")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .withColumn("text", Redaction.redactPii(col("text")))
      .drop("w", "text_hash")
}
