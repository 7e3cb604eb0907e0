package graft

import org.apache.spark.sql.functions._

/** The `spark.sql(...)` surface: temp views over the same tables, ANSI SQL
  * producing identical results to the DataFrame forms, and the
  * extensions-injected function/operator availability from SQL. */
class SqlSurfaceSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  test("SQL aggregation matches the DataFrame form") {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("li_sql")
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM li_sql GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val viaDf = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("double").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("SQL window + join matches the DataFrame form") {
    Tables(spark, dir, "orders").createOrReplaceTempView("o_sql")
    Tables(spark, dir, "customer").createOrReplaceTempView("c_sql")
    val viaSql = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o.o_custkey, o.o_orderkey,
        |    row_number() OVER (PARTITION BY o.o_custkey
        |                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        |  FROM o_sql o JOIN c_sql c ON o.o_custkey = c.c_custkey)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin).collect()
    assert(viaSql.length ==
      Tables(spark, dir, "orders").select("o_custkey").distinct().count())
  }

  test("SQL repetition signals match the q80 DataFrame form") {
    Tables(spark, dir, "documents").createOrReplaceTempView("d_sql")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  round(1.0 - CAST(size(array_distinct(w)) AS DOUBLE)
        |            / CAST(size(w) AS DOUBLE), 4) AS dup_token_frac
        |FROM (SELECT doc_id, split(lower(trim(text)), '\\s+') AS w FROM d_sql
        |      WHERE length(trim(text)) > 0)
        |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaQuery = SparkEntry.queries("q80_repetition")(spark, dir)
      .select("doc_id", "dup_token_frac")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaQuery.toSeq)
  }

  test("SQL min_by argmax matches the q87 DataFrame form") {
    Tables(spark, dir, "documents").createOrReplaceTempView("d_sql2")
    val viaSql = spark.sql(
      """WITH pc AS (
        |  SELECT p.prev AS prev, p.nxt AS nxt, count(*) AS cnt
        |  FROM (SELECT explode(zip_with(
        |          slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
        |          (a, b) -> struct(a AS prev, b AS nxt))) AS p
        |        FROM (SELECT split(lower(trim(text)), '\\s+') AS w FROM d_sql2
        |              WHERE length(trim(text)) > 0)
        |        WHERE size(w) >= 2)
        |  GROUP BY 1, 2)
        |SELECT prev, min_by(nxt, struct(-cnt, nxt)) AS top_next
        |FROM pc GROUP BY prev ORDER BY prev""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val viaQuery = SparkEntry.queries("q87_bigram_lm")(spark, dir)
      .select("prev", "top_next")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(viaSql.toSeq == viaQuery.toSeq)
  }

  test("extensions make the text-hash expressions callable from plain SQL") {
    Tables(spark, dir, "documents").createOrReplaceTempView("d_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, poly_hash(text) AS ph, min_window_hash(text, 16) AS mh,
        |  ngram_distincts(CASE WHEN length(trim(text)) = 0
        |    THEN array() ELSE split(lower(trim(text)), '\\s+') END).d_3g AS d3
        |FROM d_sql ORDER BY doc_id""".stripMargin).collect()
    val w = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(col("text"))), "\\s+"))
    val viaCol = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextHashes.poly_hash(col("text")).as("ph"),
        org.apache.spark.sql.graft.TextHashes.min_window_hash(col("text"), 16).as("mh"),
        org.apache.spark.sql.graft.TextHashes.ngram_distincts(w).getField("d_3g").as("d3"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("extensions make cosine_sim callable from plain SQL in every GraftSession") {
    Tables(spark, dir, "embeddings").createOrReplaceTempView("e_sql")
    // no manual register() call — GraftExtensions injected it at build time
    val n = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM e_sql")
      .filter(col("c") > 0.999999).count()
    assert(n == Tables(spark, dir, "embeddings").count())
  }
}
