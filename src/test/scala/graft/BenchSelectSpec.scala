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

  // ---- vs_prev_normalized (VERDICT r11 #4) -------------------------------
  // loadPrevBench mirrors tools/bench_compare.py's load(); the checked-in
  // BENCH_r10/BENCH_r11 driver envelopes are the fixture, and the expected
  // ratios are the ones bench_compare.py prints for the same pair
  // (host 1.488, total raw 1.00, common-total raw 0.94, median raw 1.02).

  private def field(json: String, name: String): Double =
    s""""$name":(-?[0-9.]+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toDouble)
      .getOrElse(fail(s"field $name missing from $json"))

  test("loadPrevBench parses a driver envelope down to fragments + trailer") {
    val (q, calib, value) = Bench.loadPrevBench("BENCH_r11.json")
      .getOrElse(fail("BENCH_r11.json did not parse"))
    // the 2000-char tail retains the 32-query raw diagnostic subset and
    // the trailer's compacted headline + calibration
    assert(q.size == 32)
    assert(calib.exists(c => math.abs(c - 0.792156065) < 1e-9))
    assert(value.exists(v => math.abs(v - 300.3265128039998) < 1e-6))
  }

  test("vsPrevJson reproduces bench_compare.py's r10-vs-r11 ratios") {
    val prev = Bench.loadPrevBench("BENCH_r10.json")
      .getOrElse(fail("BENCH_r10.json did not parse"))
    val (currQ, currCalib, currValue) = Bench.loadPrevBench("BENCH_r11.json")
      .getOrElse(fail("BENCH_r11.json did not parse"))
    val json = Bench.vsPrevJson(prev, "BENCH_r10.json", currQ,
      currValue.get, currCalib.get)
    assert(math.abs(field(json, "host_factor") - 1.488) < 0.005)
    assert(math.abs(field(json, "total_ratio_raw") - 0.997) < 0.005)
    assert(math.abs(field(json, "total_ratio") - 0.670) < 0.005)
    assert(math.abs(field(json, "common_total_ratio_raw") - 0.941) < 0.005)
    assert(math.abs(field(json, "median_ratio_raw") - 1.017) < 0.01)
    assert(json.contains(""""n_common":32"""))
    // valid JSON object (it is embedded verbatim in the bench line)
    assert(json.startsWith("{") && json.endsWith("}"))
  }

  test("a missing or unparseable prev file yields no field, never a crash") {
    assert(Bench.loadPrevBench("/nonexistent/prev.json").isEmpty)
  }

  test("vsPrevFlat renders trailer-safe scalars — the legacy trailer regex survives") {
    val prev = Bench.loadPrevBench("BENCH_r10.json").get
    val (currQ, currCalib, currValue) = Bench.loadPrevBench("BENCH_r11.json").get
    val nested = Bench.vsPrevJson(prev, "BENCH_r10.json", currQ,
      currValue.get, currCalib.get)
    val flat = Bench.vsPrevFlat(nested)
    // no nesting: bench_compare.py grabs the trailer with a non-greedy
    // {"metric":"total_trailer".*?} — an inner closing brace would
    // truncate it and lose the calibration
    assert(!flat.contains("{") && !flat.contains("}"), flat)
    assert(flat.contains("\"vs_prev_host_factor\":"))
    assert(flat.contains("\"vs_prev_median_ratio\":"))
    val trailer = s"""{"metric":"total_trailer","value":1.0,$flat,"sf":"x"}"""
    val grabbed = "\\{\"metric\":\"total_trailer\".*?\\}".r.findFirstIn(trailer)
    assert(grabbed.contains(trailer), s"regex truncated: $grabbed")
  }
}
