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

    val (curated, funnel) = CorpusMain.curate(spark, injected)
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
  }

  test("curated output writes lang-partitioned parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val (curated, _) = CorpusMain.curate(spark, Tables(spark, sf("sf0.001"), "documents"))
    curated.write.mode("overwrite").partitionBy("lang").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("lang="))
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(out)
    assert(back.count() == curated.count())
  }
}
