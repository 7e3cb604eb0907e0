package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Plain parquet scans: Catalyst's vectorized reader, column pruning and
  * predicate pushdown apply automatically, so every query that filters or
  * projects these tables gets `PushedFilters`/`ReadSchema` for free.
  *
  * Timestamp normalization: the driver has written the fixtures with two
  * different parquet timestamp encodings across regenerations —
  * TIMESTAMP(NANOS) (which Spark 4 only reads as a nanos LONG under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, see [[graft.GraftSession]])
  * and plain TIMESTAMP(MICROS) without timezone (surfacing as
  * TIMESTAMP_NTZ). Query code assumes `events.ts` is a session-timezone
  * TIMESTAMP (it feeds `unix_micros`/`window`/watermarks), so the loader
  * normalizes both encodings to TimestampType for that one column. With the
  * session pinned to UTC the NTZ→LTZ cast is wall-clock identity, and the
  * nanos path floor-divides to µs — matching DuckDB's own ns→µs truncation,
  * so oracle comparisons line up either way.
  *
  * Deliberately NOT normalized: `o_orderdate`/`l_shipdate` stay NTZ when
  * written that way. Queries only apply date arithmetic to them (NTZ-safe),
  * and queries that project them raw must emit the same arrow type DuckDB
  * does for the shared parquet — naive timestamp[us], which is exactly
  * Spark's TIMESTAMP_NTZ; an LTZ cast would flip the output schema to
  * isAdjustedToUTC=true and break the driver's type-sensitive hash.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
}

/** Session config shared by Verify / Bench / tests: everything the engine
  * needs to read the fixtures deterministically (UTC, nanos timestamps) plus
  * the local-mode tuning from the builder brief (AQE on, shuffle partitions
  * sized to cores rather than the 200 default).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE headroom: shuffles START wider than the core count and let
      // coalescePartitions shrink them from runtime sizes — at 100 TB a
      // fixed shuffle.partitions=cores either under-splits the big shuffles
      // or over-splits the small ones; starting at 4× cores and coalescing
      // down lets the SAME config serve both (parallelismFirst keeps the
      // coalesced count at or above default parallelism, so local[32]
      // timings stay within noise)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        scala.util.Try(cpus.trim.toInt * 4).getOrElse(128).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc experiment overrides without a rebuild, e.g.
    // SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false;spark.foo=bar" —
    // applied LAST so they win over the defaults above
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(b) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2)
        acc.config(k.trim, v.trim)
      }
  }
}
