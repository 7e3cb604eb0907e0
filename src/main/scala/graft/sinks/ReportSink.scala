package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The audit report sink (K2, `Job Cek Script/app.py:222-291`).
  *
  * The reference styles an Excel workbook in the sink; here presentation is
  * data (status/color/note columns computed by [[graft.operators.Audit]]),
  * and the sink is a thin adapter: deterministic row order (`seq`), a
  * header row, and any Spark-writable format. CSV is the container-friendly
  * stand-in for the Excel adapter (a `spark-excel` writer would slot in
  * unchanged — same DataFrame contract).
  */
object ReportSink {

  /** Writes the report ordered by `seq` as a single CSV with header.
    * Single-file because a report is a human artifact, not a dataset —
    * coalesce(1) is deliberate and fine for report-sized data. */
  def writeCsv(report: DataFrame, path: String): Unit =
    report.orderBy("seq")
      .coalesce(1)
      .write.mode("overwrite")
      .option("header", "true")
      .csv(path)

  /** Console summary (K3 analog): status counts, deterministic order. */
  def summarize(report: DataFrame): Seq[(String, Long)] =
    report.groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
}
