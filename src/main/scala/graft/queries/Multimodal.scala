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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
