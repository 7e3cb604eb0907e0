package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}

/** Decoded-media metadata for one payload (the typed decode output). */
case class MediaMeta(doc_id: Long, byte_len: Long, sha: String,
                     width: Int, height: Int, n_frames: Int, ok: Boolean)

/** The multimodal decode pipeline: binary payload column → typed metadata
  * via `mapPartitions` (builder brief "multimodal columns").
  *
  * The partition-mapper shape is the real thing — per-partition codec
  * initialization, row-batch iteration, typed `Dataset[MediaMeta]` output —
  * while the codec itself is a clearly-marked deterministic STUB (this
  * container ships no image/audio libraries): "dimensions" are derived from
  * the payload digest exactly as in `q42_media_meta`, so the stub is
  * cross-checked by that query's DuckDB oracle.
  *
  * At 100 TB: decode is the rare case where `mapPartitions` beats
  * expressions (per-partition native-codec reuse, zero-copy byte access);
  * everything downstream of the typed output returns to Column algebra.
  */
object MediaPipeline {

  /** STUB decode — replace with a real codec behind the same signature. */
  private def decodeStub(payload: Array[Byte], digestHex: String): (Int, Int, Int) = {
    val width = (java.lang.Long.parseLong(digestHex.substring(0, 4), 16) % 240 + 16).toInt
    val height = (java.lang.Long.parseLong(digestHex.substring(4, 8), 16) % 240 + 16).toInt
    val frames = (payload.length % 8) + 1
    (width, height, frames)
  }

  /** payloads: (doc_id BIGINT, payload BINARY) → typed metadata. */
  def decode(payloads: DataFrame): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" init — the expensive part a real decoder pools
        val md = MessageDigest.getInstance("SHA-256")
        rows.map { case (id, payload) =>
          md.reset()
          val sha = md.digest(payload).map("%02x".format(_)).mkString
          val (w, h, f) = decodeStub(payload, sha)
          MediaMeta(id, payload.length.toLong, sha, w, h, f, ok = true)
        }
      }
  }
}
