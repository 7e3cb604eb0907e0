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
}
