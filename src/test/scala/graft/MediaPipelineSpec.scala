package graft

import org.apache.spark.sql.functions._
import graft.operators.MediaPipeline

/** mapPartitions decode plumbing: typed output schema, agreement with the
  * expression-based q42 digest path, partition-count invariance. */
class MediaPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Tables(spark, sf("sf0.001"), "documents")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("decode emits one typed row per payload, sha matches sha2 expression") {
    val decoded = MediaPipeline.decode(payloads)
    val viaExpr = payloads
      .select(col("doc_id"), sha2(col("payload"), 256).as("sha_expr"))
    val joined = decoded.toDF().join(viaExpr, "doc_id")
    assert(joined.count() == 500)
    assert(joined.filter(col("sha") =!= col("sha_expr")).count() == 0)
    assert(decoded.filter(!col("ok")).count() == 0)
  }

  test("decode agrees with q42_media_meta's stub columns") {
    val q42 = SparkEntry.queries("q42_media_meta")(spark, sf("sf0.001"))
      .select(col("doc_id"), col("width").as("w42"), col("height").as("h42"),
        col("n_frames").as("f42"))
    val decoded = MediaPipeline.decode(payloads).toDF()
    val mism = decoded.join(q42, "doc_id")
      .filter(col("width") =!= col("w42") || col("height") =!= col("h42") ||
        col("n_frames") =!= col("f42"))
    assert(mism.count() == 0)
  }

  test("result is invariant to input partitioning") {
    val a = MediaPipeline.decode(payloads).collect().sortBy(_.doc_id).toSeq
    val b = MediaPipeline.decode(payloads.repartition(7)).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }
}
