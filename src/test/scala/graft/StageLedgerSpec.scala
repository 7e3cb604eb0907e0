package graft

/** StageLedgerMain: the general per-physical-stage resource ledger. The
  * spec drives `run` on the shared session and checks the contract the
  * scale investigations rely on: every stage row carries the metric
  * fields, the trailer carries the query identity, and a small query
  * reads clean (no spill). */
class StageLedgerSpec extends SparkSpec {

  test("ledger rows carry per-stage metrics; trailer carries the run identity") {
    val out = java.nio.file.Files.createTempDirectory("graft_ledger")
      .resolve("ledger.jsonl").toString
    StageLedgerMain.run(spark, "q68_native_pivot", sf("sf0.001"), out)
    val lines = scala.io.Source.fromFile(out).getLines().toSeq
    assert(lines.size >= 2, s"expected stages + trailer, got ${lines.size}")
    val (stages, trailer) = (lines.init, lines.last)
    assert(trailer.contains("\"query\":\"q68_native_pivot\"") &&
      trailer.contains("\"n_stages\":" + stages.size))
    stages.foreach { l =>
      Seq("\"stage\":", "\"tasks\":", "\"run_sec\":", "\"input_mb\":",
        "\"sh_read_mb\":", "\"sh_write_mb\":", "\"spill_mem_mb\":",
        "\"spill_disk_mb\":", "\"peak_mem_sum_mb\":")
        .foreach(f => assert(l.contains(f), s"missing $f in $l"))
    }
    // a tiny pivot at sf0.001 must not spill — the zero baseline the
    // 100x investigations compare against
    assert(stages.forall(_.contains("\"spill_disk_mb\":0.000")), stages.mkString("\n"))
    // stage ids are sorted ascending (the file reads as a timeline)
    val ids = stages.map(l =>
      "\"stage\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toInt)
    assert(ids == ids.sorted)
  }

  test("unknown query fails loudly, not with an empty ledger") {
    val out = java.nio.file.Files.createTempDirectory("graft_ledger")
      .resolve("x.jsonl").toString
    val e = intercept[RuntimeException] {
      StageLedgerMain.run(spark, "q999_nope", sf("sf0.001"), out)
    }
    assert(e.getMessage.contains("unknown query"))
  }
}
