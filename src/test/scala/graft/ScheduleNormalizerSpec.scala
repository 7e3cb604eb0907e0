package graft

import org.apache.spark.sql.Row
import graft.operators.{Audit, ScheduleNormalizer}

/** T9 raw-variant normalizer (`Job Cek Script/app.py:135-157` dispatch):
  * string-equality first, then day_of_week/day key-presence, else daily —
  * from raw JSON documents via Spark 4 VariantType. Covers all four arms,
  * the reference's undefined paths (missing repeat_period, other strings),
  * malformed documents, and composition with Audit's consumption schema. */
class ScheduleNormalizerSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(rows: (String, String)*) =
    ScheduleNormalizer.normalizeSchedules(rows.toSeq.toDF("project_id", "doc"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("all four dispatch arms, in reference order") {
    val out = normalize(
      "p_bom" -> """{"data":[{"repeat_period":"beginning_of_the_month"}]}""",
      "p_weekly" -> """{"data":[{"repeat_period":{"hour":9,"day_of_week":2}}]}""",
      "p_monthly" -> """{"data":[{"repeat_period":{"hour":3,"day":15}}]}""",
      "p_daily" -> """{"data":[{"repeat_period":{"hour":11}}]}""")
    assert(out("p_bom") == Row("p_bom", 1L, "beginning_of_the_month", null, null, null, false))
    assert(out("p_weekly") == Row("p_weekly", 1L, "weekly", 9, 2, null, false))
    assert(out("p_monthly") == Row("p_monthly", 1L, "monthly", 3, null, 15, false))
    assert(out("p_daily") == Row("p_daily", 1L, "daily", 11, null, null, false))
  }

  test("key-presence order: day_of_week wins over day (app.py:138)") {
    val out = normalize(
      "p_both" -> """{"data":[{"repeat_period":{"hour":5,"day_of_week":1,"day":20}}]}""")
    assert(out("p_both") == Row("p_both", 1L, "weekly", 5, 1, 20, false))
  }

  test("seq preserves document order; multi-entry docs") {
    val rows = ScheduleNormalizer.normalizeSchedules(Seq(
      "p" -> """{"data":[{"repeat_period":"beginning_of_the_month"},
                         {"repeat_period":{"hour":7}}]}""".replaceAll("\n\\s*", ""))
      .toDF("project_id", "doc")).orderBy("seq").collect()
    assert(rows.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, "beginning_of_the_month"), (2L, "daily")))
  }

  test("reference-undefined paths are defined (SURVEY §7.5)") {
    val out = normalize(
      // entry.get('repeat_period', {}) -> {} -> daily with null hour
      "p_missing" -> """{"data":[{"other_key":1}]}""",
      // a string other than beginning_of_the_month -> kind = that string
      "p_oddstr" -> """{"data":[{"repeat_period":"hourly"}]}""")
    assert(out("p_missing") == Row("p_missing", 1L, "daily", null, null, null, false))
    assert(out("p_oddstr") == Row("p_oddstr", 1L, "hourly", null, null, null, false))
  }

  test("key presence is type-agnostic: non-int day_of_week/day still dispatch (app.py:138)") {
    // the reference tests raw `'day_of_week' in repeat_period`, so the
    // VALUE's type is irrelevant to the dispatch — a string day_of_week is
    // weekly (with a null typed day_of_week column), same for day
    val out = normalize(
      "p_strdow" -> """{"data":[{"repeat_period":{"hour":4,"day_of_week":"tue"}}]}""",
      "p_strday" -> """{"data":[{"repeat_period":{"hour":4,"day":"first"}}]}""",
      "p_nulldow" -> """{"data":[{"repeat_period":{"hour":4,"day_of_week":null}}]}""")
    assert(out("p_strdow") == Row("p_strdow", 1L, "weekly", 4, null, null, false))
    assert(out("p_strday") == Row("p_strday", 1L, "monthly", 4, null, null, false))
    // present-but-JSON-null: Python `in` says present -> weekly
    assert(out("p_nulldow") == Row("p_nulldow", 1L, "weekly", 4, null, null, false))
  }

  test("non-string non-object repeat_period variants are defined, not errors") {
    val out = normalize(
      "p_num" -> """{"data":[{"repeat_period":5}]}""",
      "p_arr" -> """{"data":[{"repeat_period":[1,2]}]}""",
      "p_bool" -> """{"data":[{"repeat_period":true}]}""",
      "p_nullrp" -> """{"data":[{"repeat_period":null}]}""")
    // none are strings; none carry day_of_week/day/hour keys -> daily arm
    // with null hour (classifies as No Schedule downstream), never a crash
    for (p <- Seq("p_num", "p_arr", "p_bool", "p_nullrp")) {
      val r = out(p)
      assert(r.getString(2) == "daily" && r.isNullAt(3), s"$p: $r")
    }
  }

  test("malformed vs empty vs null docs") {
    val out = normalize(
      "p_bad" -> """not json at all {{{""",
      "p_nodata" -> """{"something_else": 1}""",
      "p_empty" -> """{"data":[]}""",
      "p_null" -> (null: String))
    // malformed / missing data array -> corrupt, null kind
    assert(out("p_bad") == Row("p_bad", null, null, null, null, null, true))
    assert(out("p_nodata") == Row("p_nodata", null, null, null, null, null, true))
    // a VALID empty page is not corrupt (distinct from parse failure)
    assert(out("p_empty") == Row("p_empty", null, null, null, null, null, false))
    assert(out("p_null") == Row("p_null", null, null, null, null, null, false))
  }

  test("composes with Audit: normalized output classifies as No Schedule when degenerate") {
    import org.apache.spark.sql.functions._
    val projects = Seq((1L, Some("p_bad"), "P", "P", "Delman")).toDF(
      "seq", "id", "name", "init_name", "loc")
    val scheds = ScheduleNormalizer.normalizeSchedules(
      Seq("p_bad" -> "broken{{").toDF("project_id", "doc"))
      .drop("corrupt")
    val monitoring = Seq.empty[(String, Long, Option[String])]
      .toDF("project_id", "seq", "started_at_raw")
    val nodes = Seq.empty[(String, Long, String, String, Option[String], Option[String], Option[String])]
      .toDF("project_id", "seq", "id", "name", "type", "status", "export_status")
    val report = Audit.audit(projects, scheds, monitoring, nodes,
      to_timestamp(lit("2024-10-08 09:00:00"))).collect()
    assert(report.length == 1 && report(0).getAs[String]("status") == "No Schedule")
  }
}
