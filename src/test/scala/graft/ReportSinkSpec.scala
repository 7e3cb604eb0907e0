package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sinks.ReportSink

/** The report sink adapter: round-trips the audit report through CSV with
  * row order preserved, and the status summary. */
class ReportSinkSpec extends SparkSpec {
  import spark.implicits._

  private def report = Seq(
    (1L, "08-Oct-24", "A", "A", "Delman", "Success", "", "Success", "green"),
    (2L, "08-Oct-24", "B", "B", "Delman", "Failed", "n1 --> FAILED", "", "red"),
    (3L, "08-Oct-24", "C", "C", "Delman", "Not Synced", "Last Sync at ...", "", "yellow")
  ).toDF("seq", "report_date", "init_name", "name", "loc",
    "status", "error_note", "success_flag", "color")

  test("csv round-trip preserves rows and order") {
    val dir = Files.createTempDirectory("graft_report").toString
    ReportSink.writeCsv(report, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 3)
    assert(back.orderBy(col("seq").cast("long"))
      .select("status").as[String].collect().toSeq ==
      Seq("Success", "Failed", "Not Synced"))
  }

  test("summary counts by status") {
    assert(ReportSink.summarize(report) ==
      Seq(("Failed", 1L), ("Not Synced", 1L), ("Success", 1L)))
  }

  test("sketch aggregates approximate the exact values (rows-only surface)") {
    val li = Tables(spark, sf("sf0.01"), "lineitem")
    val (approx, exact) = li.agg(
      approx_count_distinct("l_orderkey", 0.02),
      countDistinct("l_orderkey")).as[(Long, Long)].first()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
    val (pApprox, pExact) = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)),
      expr("percentile(l_extendedprice, 0.5D)")).as[(Double, Double)].first()
    assert(math.abs(pApprox - pExact) / pExact < 0.02)
  }
}
