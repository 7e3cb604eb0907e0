package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T9's hard half (VERDICT r1 "What's missing" #1): normalize the raw
  * schedules API document into the `(project_id, seq, kind, hour,
  * day_of_week, day)` schema [[Audit]] consumes.
  *
  * The reference's `repeat_period` is a union type — the string
  * `"beginning_of_the_month"` OR an object `{hour, day_of_week?, day?}` —
  * dispatched by string-equality first, then key-presence
  * (`Job Cek Script/app.py:135-157`). Spark 4's native VariantType is the
  * idiomatic mapping (SURVEY.md §1.2): `parse_json` once, then
  * `schema_of_variant` distinguishes STRING from OBJECT and
  * `try_variant_get` does key-presence — no UDF, no double-parse, fully
  * columnar. At scale this is a per-row scalar pipeline: no shuffle, one
  * pass over the documents.
  *
  * Dispatch, exactly in reference order (`app.py:135-149`):
  *  1. missing/`null` `repeat_period` → `entry.get('repeat_period', {})`
  *     gives `{}` → object branch with no keys → kind `daily`, null hour
  *     (the reference would KeyError on `rp['hour']`; defined here per
  *     SURVEY.md §7.5 — null hour classifies as No Schedule in Audit);
  *  2. string value → kind = the string itself (`"beginning_of_the_month"`
  *     is the only one the reference produces; any other string also
  *     carries a null hour and is skipped/defined the same way);
  *  3. object with `day_of_week` → `weekly`; else with `day` → `monthly`
  *     (key-presence order per `app.py:138`); else → `daily`;
  *     `hour` extracted in all three object arms (`app.py:139,149`).
  *
  * Malformed documents (unparseable JSON, or a parseable document without
  * a `data` array): `try_parse_json`/`try_variant_get` yield null, and
  * `posexplode_outer` keeps ONE row for the project with null seq/kind —
  * the project stays visible to the audit and classifies as No Schedule,
  * and the `corrupt` flag preserves the PERMISSIVE-mode `_corrupt_record`
  * diagnostic (SURVEY.md §1.3).
  */
object ScheduleNormalizer {

  /** @param raw one row per project: `(project_id, doc)` where `doc` is the
    *            raw schedules API response JSON
    *            (`{"data":[{"repeat_period": ...}, ...]}`, SURVEY.md §1.1)
    * @return `(project_id, seq, kind, hour, day_of_week, day, corrupt)` —
    *         seq = 1-based position in the document's `data` array
    */
  def normalizeSchedules(raw: DataFrame): DataFrame = {
    val entries = try_variant_get(try_parse_json(col("doc")), "$.data", "array<variant>")
    // corrupt = a document existed but didn't yield a data array; an empty
    // data array is a VALID "no schedules" page, not corruption (both reach
    // posexplode_outer's null row — the flag separates them)
    val exploded = raw
      .select(col("project_id"), entries.as("entries"),
        (col("doc").isNotNull && entries.isNull).as("corrupt"))
      .select(col("project_id"), col("corrupt"),
        posexplode_outer(col("entries")).as(Seq("pos", "e")))

    val rp = try_variant_get(col("e"), "$.repeat_period", "variant")
    val isStr = schema_of_variant(rp) === "STRING"
    val hourOf = try_variant_get(rp, "$.hour", "int")

    exploded.select(
      col("project_id"),
      (col("pos") + 1).cast("long").as("seq"), // explicit order column (§7.4.2)
      when(col("e").isNull, lit(null).cast("string")) // corrupt/empty doc
        .when(isStr, try_variant_get(rp, "$", "string"))
        // key-presence probes are type-AGNOSTIC ("variant", not "int"):
        // the reference tests raw `'day_of_week' in repeat_period`
        // (app.py:138), so {"day_of_week": "x"} is weekly even though the
        // value isn't an integer — an "int" probe would misfile it as daily
        .when(try_variant_get(rp, "$.day_of_week", "variant").isNotNull, "weekly")
        .when(try_variant_get(rp, "$.day", "variant").isNotNull, "monthly")
        .otherwise("daily") // incl. missing repeat_period -> {} (app.py:135)
        .as("kind"),
      when(!isStr, hourOf).as("hour"),
      when(!isStr, try_variant_get(rp, "$.day_of_week", "int")).as("day_of_week"),
      when(!isStr, try_variant_get(rp, "$.day", "int")).as("day"),
      col("corrupt"))
  }
}
