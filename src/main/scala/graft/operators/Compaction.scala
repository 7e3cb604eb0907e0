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

  /** All data files under `dir`, recursively — a table may be a single
    * file, a flat directory, or hive-partitioned (key=value subdirs), and
    * byte sizing must see the leaves in every case. Metadata artifacts
    * (_spark_metadata, _SUCCESS, dotfiles) are skipped like Spark's own
    * file index does. */
  private def listParquet(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) {
        if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      } else if (f.getName.startsWith("_") || f.getName.startsWith(".")) {
        Seq.empty
      } else {
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      }
    val root = new java.io.File(dir)
    if (root.isFile) Seq(root).filter(_.getName.endsWith(".parquet"))
    else Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
  }

  /** Rewrite `inDir`'s parquet into `outDir` targeting `targetFileBytes`
    * per file (and `rowGroupBytes` per row group within each file).
    * `sortKey` range-clusters rows so each output file owns a contiguous
    * key span — scan filters on that key then prune whole files/row
    * groups via min/max stats. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20, rowGroupBytes: Long = 16L << 20,
      sortKey: Option[String] = None): CompactStats = {
    val inFiles = listParquet(inDir)
    val bytesIn = inFiles.map(_.length()).sum
    val df = spark.read.parquet(inDir)
    val nOut = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    val shaped = sortKey match {
      case Some(k) => df.repartitionByRange(nOut, col(k))
      case None    => df.repartition(nOut)
    }
    shaped.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(outDir)
    val outFiles = listParquet(outDir)
    val out = spark.read.parquet(outDir)
    val Seq(rep) = Reconcile.report(Seq(("compact", df, out)))
    CompactStats(inFiles.size.toLong, bytesIn,
      outFiles.size.toLong, outFiles.map(_.length()).sum,
      rep.n_rows_b, rep.matches)
  }
}
