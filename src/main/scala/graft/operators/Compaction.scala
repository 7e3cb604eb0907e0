package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The OPTIMIZE executor — q230 plans compaction bins from file metadata;
  * this operator actually rewrites a table directory into size-targeted
  * files. The two layout pathologies it fixes are exactly the ones that
  * throttle a scan at any scale:
  *
  *  - too MANY small files: per-file open/footer overhead dominates and
  *    the driver's split planning balloons (the classic 100 TB ingest
  *    problem — millions of per-batch files);
  *  - too FEW row groups: Spark parallelizes parquet at ROW-GROUP
  *    granularity, so a huge single-row-group file runs its whole
  *    pre-shuffle stage in one task no matter how many executors exist
  *    (observed on the round-8 fixtures: a 600 k-row single-row-group
  *    scan-agg ran 1.5× slower than the same rows in 8 files).
  *
  * `compact` sizes the output from the actual input bytes (not file
  * count), optionally range-clusters on a sort key so min/max row-group
  * statistics become selective (the Z-order-lite layout q159 models), and
  * bounds row-group size via `parquet.block.size` so even one output file
  * still splits across tasks. One shuffle, streaming write — nothing
  * driver-sized except the file listing.
  *
  * Validation is delegated to [[Reconcile.report]]: the rewrite must
  * fingerprint-equal its input (content equality independent of row
  * order/partitioning) — returned in the stats so callers can refuse to
  * swap in a bad rewrite.
  */
object Compaction {

  final case class CompactStats(
      n_files_in: Long, bytes_in: Long, n_files_out: Long, bytes_out: Long,
      n_rows: Long, content_match: Boolean)

  /** Rewrite `inDir`'s parquet into `outDir` targeting `targetFileBytes`
    * per file (and `rowGroupBytes` per row group within each file).
    * `sortKey` range-clusters rows so each output file owns a contiguous
    * key span — scan filters on that key then prune whole files/row
    * groups via min/max stats. */
  /** Sizes of the files a materialized DataFrame actually reads —
    * `df.inputFiles` honors the `_spark_metadata` commit log for
    * streaming-sink directories, so orphaned/uncommitted batch files never
    * inflate the stats (a raw directory listing would count them). */
  private def inputFileSizes(df: DataFrame): Seq[Long] =
    df.inputFiles.toSeq.map(p => new java.io.File(new java.net.URI(p)).length())

  /** Quantile-bucketed Z-value over `keys` — the multi-column clustering
    * coordinate. Each key is bucketed into 2^`bits` quantile ranks (the
    * boundaries come from `approxQuantile`, a mergeable sketch over one
    * pass — driver receives only the 2^bits-element boundary array), then
    * the rank bits interleave LSB-first across keys into one integer.
    * Sorting by that integer places rows so any contiguous z-range is a
    * bounded BLOCK in every key dimension — per-file min/max stats become
    * selective for filters on ANY of the keys, not just the leading one
    * (single-key range clustering gives the trailing keys full-span
    * stats). Quantile (not uniform-width) bucketing keeps the curve
    * balanced under skew. The per-row bucket lookup is a fold over the
    * boundary array — interpreted, but this is an IO-bound OPTIMIZE job,
    * not a query hot path. */
  def zvalue(df: DataFrame, keys: Seq[String], bits: Int = 8): org.apache.spark.sql.Column = {
    require(keys.size >= 2, "zvalue: needs at least 2 keys (use sortKey for 1)")
    require(keys.size * bits <= 62, s"zvalue: ${keys.size} keys x $bits bits overflows a long")
    // approxQuantile throws IllegalArgumentException mid-job on a string
    // column; fail the precondition HERE with the actionable message (the
    // single-key repartitionByRange path handles strings fine — the
    // asymmetry is quantile bucketing, which is inherently numeric)
    keys.foreach { k =>
      val dt = df.schema(k).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"zvalue: key '$k' is $dt — quantile bucketing needs numeric keys " +
          "(use sortKey range clustering for a string key)")
    }
    val n = 1 << bits
    val bucketCols = keys.map { k =>
      val bounds = df.stat.approxQuantile(k, (1 until n).map(_.toDouble / n).toArray, 0.001)
      val arr = array(bounds.map(lit(_)): _*)
      aggregate(arr, lit(0L), (acc, b) => acc + when(col(k).cast("double") > b, 1L).otherwise(0L))
    }
    bucketCols.zipWithIndex.map { case (bucket, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(bucket, b).bitwiseAND(lit(1L)), b * keys.size + i)
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20, rowGroupBytes: Long = 16L << 20,
      sortKey: Option[String] = None, zorderKeys: Seq[String] = Nil): CompactStats = {
    // an OPTIMIZE "in place" would delete the input under the reader before
    // the fingerprint validation could ever run; Spark's own self-overwrite
    // check can be defeated by path normalization (relative vs absolute,
    // trailing slash, symlink), so resolve both to canonical form here
    require(new java.io.File(inDir).getCanonicalPath !=
        new java.io.File(outDir).getCanonicalPath,
      s"compact: outDir must differ from inDir ($inDir)")
    val df = spark.read.parquet(inDir)
    val inSizes = inputFileSizes(df)
    val bytesIn = inSizes.sum
    val nOut = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    require(sortKey.isEmpty || zorderKeys.isEmpty,
      "compact: sortKey and zorderKeys are mutually exclusive")
    val shaped = (sortKey, zorderKeys) match {
      case (Some(k), _) => df.repartitionByRange(nOut, col(k))
      case (None, ks) if ks.nonEmpty =>
        // range-partition AND sort within partitions by the z-value, then
        // project it away: each file owns a contiguous z-range, i.e. a
        // bounded block in EVERY clustered dimension
        df.withColumn("__z", zvalue(df, ks))
          .repartitionByRange(nOut, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
      case _ => df.repartition(nOut)
    }
    shaped.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(outDir)
    val out = spark.read.parquet(outDir)
    val outSizes = inputFileSizes(out)
    val Seq(rep) = Reconcile.report(Seq(("compact", df, out)))
    CompactStats(inSizes.size.toLong, bytesIn,
      outSizes.size.toLong, outSizes.sum,
      rep.n_rows_b, rep.matches)
  }
}
