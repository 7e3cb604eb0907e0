package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's SPARK_GRAFT_ONLY guard: a wrapper script exporting an empty
  * value must not silently select zero queries (the r6 VERDICT carry-over). */
class BenchSelectSpec extends AnyFunSuite {

  test("unset runs everything") {
    assert(Bench.parseOnly(None).isEmpty)
  }

  test("blank and whitespace-only values mean unset, not empty selection") {
    assert(Bench.parseOnly(Some("")).isEmpty)
    assert(Bench.parseOnly(Some("   ")).isEmpty)
    assert(Bench.parseOnly(Some(" , ,")).isEmpty)
  }

  test("a real list selects exactly the named queries, trimmed") {
    assert(Bench.parseOnly(Some("q101_pagerank, q102_triangles")) ===
      Some(Set("q101_pagerank", "q102_triangles")))
  }

  test("host calibration measures positive wall seconds at any thread count") {
    val t1 = Bench.calibrate(1)
    val t2 = Bench.calibrate(2)
    assert(t1 > 0 && t2 > 0)
    // 2 threads of the same per-thread workload can't run faster than one
    // thread of it (equal only on >= 2 truly free cores)
    assert(t2 >= t1 * 0.8)
  }
}
