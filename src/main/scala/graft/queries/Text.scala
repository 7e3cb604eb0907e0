package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextHashes
import graft.Tables

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (builder brief): token counting, quality scoring,
  * language ID (stopword heuristic), and document fingerprinting (polynomial
  * rolling hash).
  *
  * All ops are per-row scalar pipelines (no shuffle): at 100 TB they scale
  * embarrassingly — each parquet split is processed independently, and only
  * the (tiny) aggregated outputs move. Everything is built-in Column
  * expressions / higher-order functions, so whole-stage codegen applies to
  * the scalar parts and no Python/serialization boundary is crossed.
  */
object Text {

  /** Whitespace tokens of lowercased, trimmed text ([''] guarded to []). */
  private def toks(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(c)), "\\s+"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  // language marker words for the stopword-hit language-ID heuristic
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  private def hitCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(words.map(lit): _*), t))).cast("long")

  val queries: Map[String, Q] = Map(
    // ---- token counting --------------------------------------------------
    "q30_token_stats" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .withColumn("w", toks(col("text")))
        .select(
          col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          size(array_distinct(col("w"))).cast("long").as("n_distinct"),
          round(
            aggregate(col("w"), lit(0L), (acc, t) => acc + length(t)).cast("double") /
              size(col("w")).cast("double"), 4).as("avg_token_len"),
          col("n_chars"))
        .orderBy("doc_id")
    }),

    // ---- quality scoring -------------------------------------------------
    "q31_quality_score" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .withColumn("w", toks(col("text")))
        .withColumn("n_tokens", size(col("w")).cast("long"))
        .withColumn("punct_count",
          (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long"))
        .withColumn("stop_hits", hitCount(col("w"), stopwords))
        .withColumn("stop_ratio",
          round(col("stop_hits").cast("double") / col("n_tokens").cast("double"), 4))
        // weights 0.4/0.6 (not 0.5/0.5): with a 4-dp stop_ratio, 0.6*d never
        // puts a 5 in the tie digit, so Spark (half-up) and DuckDB
        // (half-even via *10^4) can't disagree on round(...,4)
        .withColumn("quality_score",
          round(least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.4 +
            col("stop_ratio") * 0.6, 4))
        .select("doc_id", "n_tokens", "punct_count", "stop_hits", "stop_ratio", "quality_score")
        .orderBy("doc_id")
    }),

    // ---- language ID (stopword-hit heuristic) ----------------------------
    "q32_langid" -> ((s: SparkSession, dir: String) => {
      val base = Tables(s, dir, "documents").withColumn("w", toks(col("text")))
      val withHits = langMarkers.foldLeft(base) { case (df, (code, words)) =>
        df.withColumn(s"hits_$code", hitCount(col("w"), words))
      }
      withHits
        .withColumn("pred_lang",
          when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr") &&
            col("hits_en") >= col("hits_es") && col("hits_en") > 0, "en")
            .when(col("hits_de") >= col("hits_fr") && col("hits_de") >= col("hits_es") &&
              col("hits_de") > 0, "de")
            .when(col("hits_fr") >= col("hits_es") && col("hits_fr") > 0, "fr")
            .when(col("hits_es") > 0, "es")
            .otherwise("unk"))
        .select("doc_id", "lang", "pred_lang", "hits_en", "hits_de", "hits_fr", "hits_es")
        .orderBy("doc_id")
    }),

    // ---- document fingerprinting: polynomial + rolling-window hash -------
    // full_hash: polynomial hash of the whole text, mod 1e9+7;
    // min_window_hash: min polynomial hash over all 16-char windows
    // (the rolling-hash fingerprint used for containment detection).
    // Native codegen'd expressions (TextHashes): the HOF form dispatched an
    // interpreted lambda per (window × position) — O(16·len) per row and
    // the 2nd-slowest bench query; the native rolling hash is O(len) in a
    // generated loop. Bit-identical to the HOF form (TextHashesSpec).
    "q33_fingerprint" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .withColumn("full_hash", TextHashes.poly_hash(col("text")))
        .withColumn("min_window_hash", TextHashes.min_window_hash(col("text"), 16))
        .select("doc_id", "full_hash", "min_window_hash")
        .orderBy("doc_id")
    }),

    // ---- BPE-ish regex tokenization (builder brief: token counting = ----
    // whitespace + a BPE-ish regex). The pattern is a GPT-2-style
    // pre-tokenizer simplification — letter runs | digit runs | punctuation
    // runs — kept lookaround-free so Java regex (Spark) and RE2 (DuckDB)
    // agree. Whitespace is the EXPLICIT class [ \t\n\f\r], not \s: Java's
    // \s includes \x0B (vertical tab), RE2's does not, so \s would let the
    // engines disagree on documents containing \x0B. Per-row scalar
    // pipeline: no shuffle, codegen'd regexp.
    "q60_bpe_tokens" -> ((s: SparkSession, dir: String) => {
      val ws = " \\t\\n\\f\\r"
      val pat = s"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9$ws]+"
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).cast("long").as("n_num"),
          size(regexp_extract_all(col("text"), lit(s"[^a-zA-Z0-9$ws]+"), lit(0))).cast("long")
            .as("n_punct"))
        .orderBy("doc_id")
    }),

    // ---- 3-gram (word) shingles (shared slice+zip_with construction) -----
    "q34_shingles" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .withColumn("w", toks(col("text")))
        .withColumn("sh", Dedup.shingles3(col("w")))
        .select(
          col("doc_id"),
          size(array_distinct(col("sh"))).cast("long").as("n_shingles"),
          when(size(col("sh")) === 0, lit(null).cast("long"))
            .otherwise(array_min(transform(array_distinct(col("sh")),
              sh => conv(substring(md5(sh.cast("binary")), 1, 8), 16, 10).cast("long"))))
            .as("min_shingle_hash"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = {
    val toksSql = """CASE WHEN length(trim(text)) = 0 THEN []
                    |     ELSE string_split_regex(lower(trim(text)), '\s+') END""".stripMargin
    def hitSql(words: Seq[String]): String =
      s"CAST(len(list_filter(w, t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t))) AS BIGINT)"

    Map(
      "q30_token_stats" ->
        s"""WITH t AS (SELECT doc_id, n_chars, $toksSql AS w FROM documents)
           |SELECT doc_id,
           | CAST(len(w) AS BIGINT) AS n_tokens,
           | CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
           | round(CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
           |       / CAST(len(w) AS DOUBLE), 4) AS avg_token_len,
           | n_chars
           |FROM t ORDER BY doc_id""".stripMargin,

      "q31_quality_score" ->
        s"""WITH t AS (SELECT doc_id, text, $toksSql AS w FROM documents),
           |u AS (SELECT doc_id,
           |  CAST(len(w) AS BIGINT) AS n_tokens,
           |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS punct_count,
           |  ${hitSql(stopwords)} AS stop_hits
           | FROM t)
           |SELECT doc_id, n_tokens, punct_count, stop_hits,
           | round(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
           | round(least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.4 +
           |       round(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) * 0.6, 4) AS quality_score
           |FROM u ORDER BY doc_id""".stripMargin,

      "q32_langid" -> {
        val hits = langMarkers.map { case (code, words) => s"${hitSql(words)} AS hits_$code" }
        s"""WITH t AS (SELECT doc_id, lang, $toksSql AS w FROM documents),
           |u AS (SELECT doc_id, lang, ${hits.mkString(", ")} FROM t)
           |SELECT doc_id, lang,
           | CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es
           |        AND hits_en > 0 THEN 'en'
           |      WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de > 0 THEN 'de'
           |      WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
           |      WHEN hits_es > 0 THEN 'es'
           |      ELSE 'unk' END AS pred_lang,
           | hits_en, hits_de, hits_fr, hits_es
           |FROM u ORDER BY doc_id""".stripMargin
      },

      "q33_fingerprint" ->
        """SELECT doc_id,
          | list_reduce(list_prepend(0::BIGINT,
          |   list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
          |   (a, b) -> (a * 31 + b) % 1000000007) AS full_hash,
          | CASE WHEN length(text) < 16 THEN NULL ELSE
          |  list_min([list_reduce(list_prepend(0::BIGINT,
          |     list_transform(string_split(substr(text, i, 16), ''), c -> ascii(c)::BIGINT)),
          |     (a, b) -> (a * 31 + b) % 1000000007)
          |    for i in range(1, length(text) - 14)])
          | END AS min_window_hash
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q60_bpe_tokens" ->
        """SELECT doc_id,
          | CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\f\r]+')) AS BIGINT) AS n_bpe,
          | CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
          | CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \t\n\f\r]+')) AS BIGINT) AS n_punct
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q34_shingles" ->
        s"""WITH t AS (SELECT doc_id, ${"CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(lower(trim(text)), '\\s+') END"} AS w FROM documents),
           |u AS (SELECT doc_id,
           |  CASE WHEN len(w) < 3 THEN []
           |       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
           |  END AS sh
           | FROM t)
           |SELECT doc_id,
           | CAST(len(list_distinct(sh)) AS BIGINT) AS n_shingles,
           | CASE WHEN len(sh) = 0 THEN NULL
           |      ELSE list_min(list_transform(list_distinct(sh),
           |             s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)) END AS min_shingle_hash
           |FROM u ORDER BY doc_id""".stripMargin
    )
  }
}
