package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data preparation operators over `documents` — the steps between
  * a curated corpus (CorpusMain) and a training run:
  *
  *  - q72 TF-IDF: the classic salience score, the ranking primitive behind
  *    keyword extraction and quality heuristics;
  *  - q73 deterministic split: reproducible train/val/test assignment by
  *    content-independent hash bucket — never `rand()`, so reruns, retries
  *    and speculative tasks agree, and the split is stable across cluster
  *    sizes;
  *  - q74 sequence packing: concatenate-then-chunk packing of documents
  *    into fixed token windows (the standard pretraining batch layout),
  *    expressed as one running-sum window — each doc learns its global
  *    token offset and the context-window range it lands in.
  *
  * Scale notes: q72 is two shuffles (doc-term aggregation, term document
  * frequency) + one broadcast of the corpus size; q73 is per-row, no
  * shuffle; q74 is a single window over the doc order — at 100 TB the
  * offset assignment would run per-partition with a prefix-sum of partition
  * totals (the same plan Spark generates for an unbounded-preceding sum).
  */
object TrainPrep {

  /** Raw (order- and multiplicity-preserving) whitespace tokens. */
  private def rawToks(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(c)), "\\s+"))

  val queries: Map[String, Q] = Map(
    // ---- TF-IDF: top salient term per document ---------------------------
    // tf from the raw token multiset, df over distinct docs per term, idf =
    // ln(N/df). Ranking ties break on the term string; the score is
    // round(4) on both sides.
    "q72_tfidf" -> ((s: SparkSession, dir: String) => {
      val docs = Tables(s, dir, "documents")
      val n = docs.count() // corpus size: one scalar, computed once
      val terms = docs
        .select(col("doc_id"), explode(rawToks(col("text"))).as("tok"))
      val tf = terms.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // tf rows are already distinct (doc, tok), so document frequency is
      // one more aggregation over tf — not a second corpus scan + distinct
      // (the tokenize subtree is shared; ReuseExchange dedups its shuffle)
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(desc("tfidf"), asc("tok"))
      tf.join(df, Seq("tok"))
        .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("tok").as("top_term"),
          col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
          col("tfidf"))
        .orderBy("doc_id")
    }),

    // ---- deterministic train/val/test split ------------------------------
    // bucket = first 4 md5 hex digits of the doc id, mod 100 — the shared
    // md5 trick, so the oracle reproduces the assignment bit-for-bit.
    // 90/5/5; content-independent (id-keyed), so editing a doc never moves
    // it across splits.
    "q73_det_split" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
            .cast("long") % 100).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test"))
        .orderBy("doc_id")
    }),

    // ---- stratified Bernoulli sample (per-language rates) ----------------
    // The rebalancing sampler: over-represented strata are kept at a lower
    // rate (en 20%) than the rest (80%). Hash-bucket Bernoulli, not
    // rank-based like q77: membership is decided per row with no window
    // and no shuffle, so it scales embarrassingly and is reproducible
    // across reruns/speculation. The hash is SALTED ('smpl' prefix) so the
    // sample is independent of q73's split buckets — reusing one hash for
    // both would correlate the sample with the train/val/test assignment.
    "q82_stratified_sample" -> ((s: SparkSession, dir: String) => {
      val bucket = (conv(substring(md5(
          concat(lit("smpl"), col("doc_id").cast("string")).cast("binary")), 1, 4), 16, 10)
        .cast("long") % 100)
      Tables(s, dir, "documents")
        .withColumn("bucket", bucket)
        .withColumn("rate",
          when(col("lang") === "en", lit(20L)).otherwise(lit(80L)))
        .filter(col("bucket") < col("rate"))
        .select("doc_id", "lang", "bucket", "rate")
        .orderBy("doc_id")
    }),

    // ---- per-language quality quota (corpus balancing) -------------------
    // Keep each language's top fifth by token count — the "balance the
    // languages" sampling step between curation and training. Quota and
    // ranking are pure integer math (ceil(n/5) = (n+4) div 5; ties broken
    // by doc_id), so there is no float boundary anywhere. One window over
    // (lang), no extra shuffle beyond it.
    "q77_lang_quota" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("lang").orderBy(desc("n_tokens"), asc("doc_id"))
      val cnt = Window.partitionBy("lang")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(rawToks(col("text"))).cast("long").as("n_tokens"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("quota", expr("(count(1) OVER (PARTITION BY lang) + 4) div 5"))
        .filter(col("rk") <= col("quota"))
        .select("lang", "doc_id", "n_tokens", "rk")
        .orderBy("lang", "doc_id")
    }),

    // ---- sequence packing into fixed context windows ---------------------
    // Concatenate docs in id order, cut every `cap` tokens (how pretraining
    // actually packs batches — documents may straddle a boundary). The
    // global running token count comes from the DISTRIBUTED two-phase
    // prefix sum (operators/PrefixSum), not a no-partition window — the
    // window form funnels the whole corpus through one task
    // (Exchange SinglePartition), which is exactly the plan that dies at
    // 100 TB. Empty docs occupy zero tokens and inherit the offset.
    "q74_seq_packing" -> ((s: SparkSession, dir: String) => {
      val cap = 2048
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), size(rawToks(col("text"))).cast("long").as("n_tokens"))
      graft.operators.PrefixSum.runningSum(toks, "doc_id", "n_tokens", "end_offset")
        .select(
          col("doc_id"), col("n_tokens"),
          (col("end_offset") - col("n_tokens")).as("start_offset"),
          expr(s"(end_offset - n_tokens) div $cap").as("first_window"),
          expr(s"greatest(end_offset - 1, end_offset - n_tokens) div $cap").as("last_window"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q72_tfidf" ->
      """WITH tk AS (SELECT doc_id,
        |   CASE WHEN length(trim(text)) = 0 THEN []
        |        ELSE string_split_regex(lower(trim(text)), '\s+') END AS w
        | FROM documents),
        |terms AS (SELECT doc_id, unnest(w) AS tok FROM tk),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM terms GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM terms GROUP BY tok),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |s AS (SELECT doc_id, tok, tf, df,
        |        round(tf * ln(n.n / df), 4) AS tfidf
        |      FROM tf JOIN df USING (tok), n)
        |SELECT doc_id, tok AS top_term, CAST(tf AS BIGINT) AS tf,
        |       CAST(df AS BIGINT) AS df, tfidf
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY tfidf DESC, tok ASC) = 1
        |ORDER BY doc_id""".stripMargin,

    "q73_det_split" ->
      """SELECT doc_id,
        | ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS bucket,
        | CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 < 90 THEN 'train'
        |      WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 < 95 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q82_stratified_sample" ->
      """WITH t AS (SELECT doc_id, lang,
        |  ('0x' || substr(md5('smpl' || doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS bucket,
        |  CAST(CASE WHEN lang = 'en' THEN 20 ELSE 80 END AS BIGINT) AS rate
        | FROM documents)
        |SELECT doc_id, lang, bucket, rate FROM t
        |WHERE bucket < rate ORDER BY doc_id""".stripMargin,

    "q77_lang_quota" ->
      """WITH tk AS (SELECT doc_id, lang,
        |   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS BIGINT)
        |     AS n_tokens
        | FROM documents),
        |r AS (SELECT lang, doc_id, n_tokens,
        |  CAST(row_number() OVER (PARTITION BY lang
        |         ORDER BY n_tokens DESC, doc_id ASC) AS BIGINT) AS rk,
        |  (count(*) OVER (PARTITION BY lang) + 4) // 5 AS quota
        | FROM tk)
        |SELECT lang, doc_id, n_tokens, rk FROM r WHERE rk <= quota
        |ORDER BY lang, doc_id""".stripMargin,

    "q74_seq_packing" ->
      """WITH tk AS (SELECT doc_id,
        |   CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_tokens
        | FROM documents),
        |o AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |        sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_offset
        |      FROM tk)
        |SELECT doc_id, n_tokens,
        | CAST(end_offset - n_tokens AS BIGINT) AS start_offset,
        | CAST((end_offset - n_tokens) // 2048 AS BIGINT) AS first_window,
        | CAST(greatest(end_offset - 1, end_offset - n_tokens) // 2048 AS BIGINT) AS last_window
        |FROM o ORDER BY doc_id""".stripMargin
  )
}
