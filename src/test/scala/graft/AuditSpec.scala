package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Audit

/** Golden tests for the Daily Job Audit (SURVEY.md §3.3, §7.1) over the
  * FIXTURES.md §A domain fixtures, incl. the named regression cases:
  * Q1 null-whitelist, Q2 +7-not-+25, first-match order, memo/dedup (J2),
  * >5-node cap, and the defined behavior for the reference's NameError
  * paths (SURVEY.md §7.5).
  *
  * asOf pinned to 2024-10-08 09:00 UTC = 2024-10-08 16:00 Asia/Bangkok.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private val asOf = to_timestamp(lit("2024-10-08 09:00:00"))

  // ts strings in the reference's raw format
  private def raw(s: String) = s // "EEE, dd MMM yyyy, HH:mm:ss GMT+0000"
  private val syncedTodayTs = raw("Tue, 08 Oct 2024, 02:30:00 GMT+0000") // 09:30 Bangkok = today
  private val syncedOldTs = raw("Mon, 07 Oct 2024, 02:30:00 GMT+0000")   // yesterday Bangkok

  private def projects: DataFrame = Seq(
    (1L, Some("p_success"), "P Success", "P Success", "Delman"),
    (2L, Some("p_failed"), "P Failed", "P Failed", "Delman"),
    (3L, Some("p_notsynced"), "P NotSynced", "P NotSynced", "Delman"),
    (4L, Some("p_nosched"), "P NoSched", "P NoSched", "Delman"),
    (5L, Some("p_allbom"), "P AllBom", "P AllBom", "Delman"),
    (6L, Some("p_evening"), "P Evening", "P Evening", "Delman"),
    (7L, Some("p_cap"), "P Cap", "P Cap", "Delman"),
    (8L, Some("p_nullstatus"), "P NullStatus", "P NullStatus", "Delman"),
    (9L, Some("p_failed"), "P Failed Dup", "P Failed Dup", "Delman"), // J2 dup id
    (10L, None: Option[String], "P NullId", "P NullId", "Delman"),
    (11L, Some("p_weekly"), "P Weekly", "P Weekly", "Delman")
  ).toDF("seq", "id", "name", "init_name", "loc")

  private def schedules: DataFrame = Seq(
    // (project_id, seq, kind, hour, day_of_week, day)
    ("p_success", 1L, "daily", Some(2), None: Option[Int], None: Option[Int]),
    ("p_failed", 1L, "daily", Some(2), None: Option[Int], None: Option[Int]),
    ("p_notsynced", 1L, "beginning_of_the_month", None: Option[Int], None: Option[Int], None: Option[Int]),
    ("p_notsynced", 2L, "daily", Some(2), None: Option[Int], None: Option[Int]), // skip-then-take
    ("p_allbom", 1L, "beginning_of_the_month", None: Option[Int], None: Option[Int], None: Option[Int]),
    ("p_evening", 1L, "daily", Some(12), None: Option[Int], None: Option[Int]), // 12+7=19 >= 18
    ("p_cap", 1L, "daily", Some(2), None: Option[Int], None: Option[Int]),
    ("p_nullstatus", 1L, "daily", Some(2), None: Option[Int], None: Option[Int]),
    ("p_weekly", 1L, "weekly", Some(12), Some(2), None: Option[Int]), // Q2: +7 => 19, not +25
    ("p_nullid", 1L, "daily", Some(2), None: Option[Int], None: Option[Int])
  ).toDF("project_id", "seq", "kind", "hour", "day_of_week", "day")

  private def monitoring: DataFrame = Seq(
    ("p_success", 1L, None: Option[String]), // leading null: first-non-null takes seq 2
    ("p_success", 2L, Some(syncedTodayTs)),
    ("p_failed", 1L, Some(syncedTodayTs)),
    ("p_notsynced", 1L, Some(syncedOldTs)),
    ("p_nosched", 1L, Some(syncedOldTs)),
    ("p_evening", 1L, Some(syncedOldTs)), // old sync but evening => nodes checked anyway
    ("p_cap", 1L, Some(syncedTodayTs)),
    ("p_nullstatus", 1L, Some(syncedTodayTs)),
    ("p_weekly", 1L, Some(syncedOldTs))
  ).toDF("project_id", "seq", "started_at_raw")

  private def nodes: DataFrame = {
    val capNodes = (1 to 6).map(i =>
      ("p_cap", i.toLong, s"n$i", s"cap_node_$i", "next", Some("FAILED"), Some("SUCCESS")))
    (Seq(
      ("p_success", 1L, "n1", "ok_node", "source", Some("SUCCESS"), Some("SUCCESS")),
      ("p_failed", 1L, "n1", "bad_node", "next", Some("FAILED"), Some("SUCCESS")),
      ("p_failed", 2L, "n2", "bad_export", "next", Some("SUCCESS"), Some("EXPORT FAILED")),
      ("p_evening", 1L, "n1", "ok_node", "next", Some("UPSTREAM FAILED"), Some("CREATED")),
      ("p_nullstatus", 1L, "n1", "null_status_node", "next", None: Option[String], Some("SUCCESS")),
      ("p_weekly", 1L, "n1", "ok", "next", Some("SUCCESS"), Some("SUCCESS"))
    ) ++ capNodes).toDF("project_id", "seq", "id", "name", "type", "status", "export_status")
  }

  private lazy val report =
    Audit.audit(projects, schedules, monitoring, nodes, asOf)
      .collect().map(r => r.getLong(0) -> r).toMap

  private def statusOf(seq: Long) = report(seq).getAs[String]("status")
  private def noteOf(seq: Long) = report(seq).getAs[String]("error_note")

  test("healthy project, synced today before 18:00 => Success") {
    assert(statusOf(1L) == "Success")
    assert(noteOf(1L) == "")
    assert(report(1L).getAs[String]("success_flag") == "Success")
    assert(report(1L).getAs[String]("color") == "green")
  }

  test("failing nodes => Failed with per-node notes in source order") {
    assert(statusOf(2L) == "Failed")
    assert(noteOf(2L) == "bad_node --> FAILED\nbad_export --> export EXPORT FAILED")
    assert(report(2L).getAs[String]("color") == "red")
  }

  test("scheduled before 18:00 but last sync yesterday => Not Synced") {
    assert(statusOf(3L) == "Not Synced")
    assert(noteOf(3L).startsWith("Last Sync at Mon, 07 Oct 2024"))
  }

  test("no schedule rows => No Schedule with last-sync note") {
    assert(statusOf(4L) == "No Schedule")
    assert(noteOf(4L).startsWith("Last Sync at Mon, 07 Oct 2024"))
  }

  test("all beginning_of_the_month => No Schedule (defined NameError path)") {
    assert(statusOf(5L) == "No Schedule")
  }

  test("converted hour >= 18:00 => nodes checked regardless of sync recency") {
    assert(statusOf(6L) == "Success") // whitelisted UPSTREAM FAILED/CREATED
  }

  test("more than 5 failing nodes => capped note (A3)") {
    assert(statusOf(7L) == "Failed")
    assert(noteOf(7L) == "error in more than 5 nodes")
  }

  test("Q1 regression: NULL status is a whitelist member => healthy") {
    assert(statusOf(8L) == "Success")
  }

  test("J2: duplicate project id rows share one computed status") {
    assert(statusOf(9L) == statusOf(2L))
    assert(noteOf(9L) == noteOf(2L))
  }

  test("NULL project id row classifies without crashing (memo key None)") {
    assert(statusOf(10L) == "No Schedule") // no schedules under NULL id
  }

  test("Q2 divergence: weekly schedule gets +7 (12+7=19 => evening path)") {
    // under the reference's +25 the hour would be 13 => before 18:00 =>
    // Not Synced (old sync); under our +7 it is 19 => nodes checked => Success
    assert(statusOf(11L) == "Success")
  }

  test("referenceQ2 mode reproduces the literal +25 on weekly/monthly only") {
    // the r12 switch: same inputs, referenceQ2 = true — the weekly project
    // lands at (12+25)%24 = 13 < 18, its last sync is old => Not Synced,
    // exactly what app.py:142-144 computes; every daily-schedule project
    // (+7 in BOTH modes) classifies identically
    val ref = Audit.audit(projects, schedules, monitoring, nodes, asOf,
        referenceQ2 = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(ref(11L).getAs[String]("status") == "Not Synced")
    assert(ref(11L).getAs[String]("error_note").startsWith("Last Sync at "))
    for (s <- 1L to 10L)
      assert(ref(s).getAs[String]("status") == statusOf(s),
        s"non-weekly project $s diverged under referenceQ2")
  }

  test("report preserves input row order via seq") {
    val seqs = Audit.audit(projects, schedules, monitoring, nodes, asOf)
      .select("seq").as[Long].collect()
    assert(seqs.toSeq == (1L to 11L))
  }
}
