package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Plain parquet scans: Catalyst's vectorized reader, column pruning and
  * predicate pushdown apply automatically, so every query that filters or
  * projects these tables gets `PushedFilters`/`ReadSchema` for free.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 refuses
  * by default; sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
  * (see [[graft.GraftSession]]) and the loader converts the nanos-long back
  * to a microsecond TIMESTAMP (floor division — matches DuckDB's own ns→µs
  * truncation, so oracle comparisons line up).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}

/** Session config shared by Verify / Bench / tests: everything the engine
  * needs to read the fixtures deterministically (UTC, nanos timestamps) plus
  * the local-mode tuning from the builder brief (AQE on, shuffle partitions
  * sized to cores rather than the 200 default).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
