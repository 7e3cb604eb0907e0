package graft.queries

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: treat media payloads as opaque `BINARY`
  * columns with typed, deterministic metadata derived from the bytes.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (dimensions/frames derived from the
  * payload's sha-256) — the Spark-side plumbing is real: binary column,
  * per-row digesting, schema of the decoded-metadata struct, and the
  * mapPartitions batch shape in [[graft.operators.MediaPipeline]].
  *
  * At 100 TB this is the pattern for media tables: binary payload column +
  * pushdown-prunable metadata columns; decode happens once per partition
  * with a pooled codec, never on the driver.
  */
object Multimodal {

  val queries: Map[String, Q] = Map(
    // payload digest + STUB decode (text bytes stand in for media payloads)
    "q42_media_meta" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("byte_len", length(col("payload")).cast("long"))
        .withColumn("sha", sha2(col("payload"), 256))
        // STUB decode: a real implementation would decode image headers here.
        .withColumn("width", (conv(substring(col("sha"), 1, 4), 16, 10).cast("long") % 240) + 16)
        .withColumn("height", (conv(substring(col("sha"), 5, 4), 16, 10).cast("long") % 240) + 16)
        .withColumn("n_frames", (col("byte_len") % 8) + 1)
        .select("doc_id", "byte_len", "sha", "width", "height", "n_frames")
        .orderBy("doc_id")
    }),

    // frame sampling + resize + feature extraction over the decoded stub
    // metadata (builder brief: "decode / feature-extract / resize /
    // frame-sample"). Every 2nd frame is materialized as a row
    // (sequence → posexplode: the generator shape of frame extraction);
    // resize fits a 64×64 box with INTEGER-ONLY aspect-preserving math
    // (w*64 div max(w,h)) so Spark and DuckDB can't diverge on fp rounding;
    // the per-frame "feature" (brightness) is the first byte of the frame's
    // deterministic stub digest. At scale this is the explode-heavy side of
    // a media pipeline: one row per sampled frame, partition-parallel, no
    // shuffle until the per-label aggregation.
    "q61_frame_sample" -> ((s: SparkSession, dir: String) => {
      val meta = Tables(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("sha", sha2(col("payload"), 256))
        .withColumn("width", (conv(substring(col("sha"), 1, 4), 16, 10).cast("long") % 240) + 16)
        .withColumn("height", (conv(substring(col("sha"), 5, 4), 16, 10).cast("long") % 240) + 16)
        .withColumn("n_frames", (length(col("payload")).cast("long") % 8) + 1)
      meta
        .withColumn("out_w", expr("width * 64 div greatest(width, height)"))
        .withColumn("out_h", expr("height * 64 div greatest(width, height)"))
        .select(col("doc_id"), col("sha"), col("out_w"), col("out_h"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))).as("frame_idx"))
        .withColumn("frame_sha",
          md5(concat(col("sha"), lit(":"), col("frame_idx")).cast("binary")))
        .withColumn("brightness",
          conv(substring(col("frame_sha"), 1, 2), 16, 10).cast("long"))
        .select("doc_id", "frame_idx", "out_w", "out_h", "frame_sha", "brightness")
        .orderBy("doc_id", "frame_idx")
    })
  )

  val oracles: Map[String, String] = Map(
    "q42_media_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | sha256(text) AS sha,
        | ('0x' || substr(sha256(text), 1, 4))::BIGINT % 240 + 16 AS width,
        | ('0x' || substr(sha256(text), 5, 4))::BIGINT % 240 + 16 AS height,
        | CAST(octet_length(encode(text)) AS BIGINT) % 8 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q61_frame_sample" ->
      """WITH m AS (SELECT doc_id, sha256(text) AS sha,
        |  ('0x' || substr(sha256(text), 1, 4))::BIGINT % 240 + 16 AS width,
        |  ('0x' || substr(sha256(text), 5, 4))::BIGINT % 240 + 16 AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) % 8 + 1 AS n_frames
        | FROM documents),
        |f AS (SELECT doc_id, sha,
        |  width * 64 // greatest(width, height) AS out_w,
        |  height * 64 // greatest(width, height) AS out_h,
        |  unnest(range(0, n_frames, 2)) AS frame_idx
        | FROM m)
        |SELECT doc_id, frame_idx, out_w, out_h,
        | md5(sha || ':' || frame_idx) AS frame_sha,
        | ('0x' || substr(md5(sha || ':' || frame_idx), 1, 2))::BIGINT AS brightness
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  )
}
