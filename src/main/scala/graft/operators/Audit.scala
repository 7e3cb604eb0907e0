package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Daily Job Audit — the reference's richest pipeline
  * (`Job Cek Script/app.py:96-220`, SURVEY.md §3.3) re-expressed as pure,
  * set-oriented DataFrame algebra.
  *
  * Input schemas (FIXTURES.md §A; every ordered source carries `seq` because
  * the reference's "first entry" semantics depend on API order,
  * SURVEY.md §7.4.2):
  *  - projects(seq, id, name, init_name, loc)
  *  - schedules(project_id, seq, kind, hour, day_of_week, day) —
  *    `repeat_period` variant normalized at ingest (SURVEY.md §7.4.3)
  *  - monitoring(project_id, seq, started_at_raw) — raw format
  *    'EEE, dd MMM yyyy, HH:mm:ss GMT+0000' (`app.py:49`)
  *  - nodes(project_id, seq, id, name, type, status, export_status)
  *
  * Where the reference loops per project with up to 3 serial HTTP round
  * trips each (`app.py:115-218`), this plan reads each source once,
  * computes per-project derivations with windows/aggregations, and joins —
  * two shuffles total, no driver-side iteration, scale-out by partitioning.
  *
  * Documented divergences (SURVEY.md §7.5):
  *  - GMT+25 weekly/monthly branch (`app.py:138-144`) → +7 everywhere;
  *  - reference NameError paths (all-beginning_of_the_month schedules,
  *    `app.py:160`; monitoring with no non-null started_at in the
  *    no-schedule branch, `app.py:215`) → defined: "No Schedule" /
  *    "Not Synced" with empty note timestamp.
  */
object Audit {

  /** The NULL-friendly status whitelist (`app.py:113`): membership is
    * Python `not in`, so NULL is a *member* (Q1, SURVEY.md §7.4.1).
    * Never translate as bare `NOT isin` — ANSI three-valued logic would
    * silently flip Failed→Success for NULL-status nodes. */
  val Whitelist: Seq[String] = Seq("SUCCESS", "CREATED", "UPSTREAM FAILED")

  def statusOk(c: Column): Column = c.isNull || c.isin(Whitelist: _*)

  /** Status → report color (presentation-as-data, SURVEY.md §2.6 K2/T13). */
  val ColorMap: Map[String, String] = Map(
    "Success" -> "green", "Failed" -> "red",
    "Not Synced" -> "yellow", "No Schedule" -> "grey", "" -> "none")

  // Raw format is 'EEE, dd MMM yyyy, HH:mm:ss GMT+0000' (app.py:49), but
  // Spark's parser rejects day-of-week fields ('E') for parsing — strip the
  // weekday prefix and parse the rest.
  private val RawTsFormat = "dd MMM yyyy, HH:mm:ss 'GMT'Z"
  private val NoteTsFormat = "EEE, dd MMM yyyy, HH:mm:ss"
  private val ReportZone = "Asia/Bangkok"

  /** Runs the audit.
    *
    * @param asOfUtc injectable "now" (UTC) — the reference hardcodes
    *                wall-clock `datetime.now()` (`app.py:176,224`);
    *                injectability makes the classification testable.
    * @param referenceQ2 reproduce the reference's literal GMT+25 offset on
    *                weekly/monthly schedules (`app.py:142-144` applies
    *                `gmt_offset = 25`, so `% 24` lands those branches at
    *                +1 instead of +7) — the Q2 quirk (SURVEY.md §0). The
    *                default keeps the engine's normalized +7 everywhere;
    *                the flag makes the last documented divergence
    *                switchable for byte-faithful replays of the original
    *                report.
    * @return one row per input project row, in input (`seq`) order:
    *         (seq, report_date, init_name, name, loc, status, error_note,
    *          success_flag, color)
    */
  def audit(projects: DataFrame, schedules: DataFrame, monitoring: DataFrame,
            nodes: DataFrame, asOfUtc: Column = current_timestamp(),
            referenceQ2: Boolean = false): DataFrame = {

    // ---- distinct project keys (J2: memoized per-key computation) --------
    // Null-safe: a NULL id is a valid memo key in the reference (dict key
    // None, `app.py:118`), so group with null-safe semantics via groupBy.
    val keys = projects.groupBy(col("id").as("pid")).agg(count(lit(1)).as("n_rows"))

    // ---- first usable schedule entry per project (A4 first-match) --------
    // Reference: iterate in API order, skip "beginning_of_the_month",
    // take the first other entry (`app.py:134-157`).
    val wSched = Window.partitionBy("project_id").orderBy("seq")
    val firstSched = schedules
      .filter(col("kind") =!= "beginning_of_the_month")
      .withColumn("rn", row_number().over(wSched))
      .filter(col("rn") === 1)
      .select(col("project_id"), col("kind"), col("hour"))

    // hour offset: normalized +7 for every branch; under referenceQ2 the
    // weekly/monthly branches take the literal 25 (≡ +1 after % 24)
    val gmtOffset =
      if (referenceQ2)
        when(col("kind").isin("weekly", "monthly"), lit(25)).otherwise(lit(7))
      else lit(7)
    val schedCounts = schedules.groupBy("project_id")
      .agg(count(lit(1)).as("n_sched"))

    // ---- first non-null monitoring entry per project (A4) ----------------
    val wMon = Window.partitionBy("project_id").orderBy("seq")
    val firstMon = monitoring
      .filter(col("started_at_raw").isNotNull)
      .withColumn("rn", row_number().over(wMon))
      .filter(col("rn") === 1)
      .select(col("project_id"),
        to_timestamp(regexp_replace(col("started_at_raw"), "^[A-Za-z]{3}, ", ""),
          RawTsFormat).as("last_sync_utc"))

    // ---- failing nodes per project (J1 + A1-A3) --------------------------
    // A node fails if status OR export_status falls outside the NULL-
    // friendly whitelist (`app.py:188`). Note line per failing node
    // (`app.py:257-261`), newline-joined in source order, capped at 5
    // (`app.py:262-263`).
    val errAgg = nodes
      .filter(!(statusOk(col("status")) && statusOk(col("export_status"))))
      .withColumn("line",
        when(!statusOk(col("status")),
          concat_ws(" --> ", col("name"), col("status")))
          .otherwise(concat(col("name"), lit(" --> export "), col("export_status"))))
      .groupBy("project_id")
      .agg(count(lit(1)).as("n_err"),
        array_join(
          transform(sort_array(collect_list(struct(col("seq"), col("line")))),
            s => s.getField("line")), "\n").as("err_lines"))

    // ---- per-project classification (§2.5, precedence as in app.py) ------
    val convertedHour = (col("hour") + gmtOffset) % 24 // Q2: +7 normalized, +25 under referenceQ2
    val before18 = convertedHour * 60 < lit(18 * 60) // time-of-day compare (T8)
    val lastSyncLocal = convert_timezone(lit("UTC"), lit(ReportZone), col("last_sync_utc"))
    val asOfLocal = convert_timezone(lit("UTC"), lit(ReportZone), asOfUtc)
    val syncedToday = to_date(lastSyncLocal) >= to_date(asOfLocal)
    val lastSyncNote = concat(lit("Last Sync at "),
      coalesce(date_format(lastSyncLocal, NoteTsFormat), lit("")))

    val classified = keys
      .join(firstSched, col("pid") <=> col("project_id"), "left").drop("project_id")
      .join(schedCounts, col("pid") <=> col("project_id"), "left").drop("project_id")
      .join(firstMon, col("pid") <=> col("project_id"), "left").drop("project_id")
      .join(errAgg, col("pid") <=> col("project_id"), "left").drop("project_id")
      .withColumn("status",
        when(coalesce(col("n_sched"), lit(0L)) === 0 || col("hour").isNull, "No Schedule")
          .when(before18 && !coalesce(syncedToday, lit(false)), "Not Synced")
          .when(coalesce(col("n_err"), lit(0L)) > 0, "Failed")
          .otherwise("Success"))
      .withColumn("error_note",
        when(col("status").isin("No Schedule", "Not Synced"), lastSyncNote)
          .when(col("status") === "Failed",
            when(col("n_err") > 5, lit("error in more than 5 nodes"))
              .otherwise(col("err_lines")))
          .otherwise(lit("")))
      .select("pid", "status", "error_note")

    // ---- join back to every project row, restore input order -------------
    val colorExpr = ColorMap.foldLeft(lit("none")) { case (acc, (k, v)) =>
      when(col("status") === k, v).otherwise(acc)
    }
    projects
      .join(classified, col("id") <=> col("pid"), "left").drop("pid")
      .withColumn("report_date", date_format(asOfLocal, "dd-MMM-yy"))
      .withColumn("success_flag", // T12: column L
        when(col("status") === "Success", "Success").otherwise(""))
      .withColumn("color", colorExpr)
      .select("seq", "report_date", "init_name", "name", "loc",
        "status", "error_note", "success_flag", "color")
      .orderBy("seq")
  }
}
