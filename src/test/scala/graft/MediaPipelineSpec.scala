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

  // ---- r18: the REAL codec path (VERDICT r17 #7) --------------------------

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("real planted PNG/BMP bytes decode to true dimensions; text stays on the stub") {
    import spark.implicits._
    val png = imageBytes("png", 20, 14)
    val bmp = imageBytes("bmp", 7, 5)
    val txt = "not an image at all just plain words".getBytes("UTF-8")
    val in = Seq((1L, png), (2L, bmp), (3L, txt))
      .toDF("doc_id", "payload")
    val out = MediaPipeline.decode(in).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(1L).codec == "png" && out(1L).width == 20 &&
      out(1L).height == 14 && out(1L).n_frames == 1, s"png: ${out(1L)}")
    assert(out(2L).codec == "bmp" && out(2L).width == 7 &&
      out(2L).height == 5, s"bmp: ${out(2L)}")
    // the non-image payload takes the deterministic stub (q42 parity path)
    assert(out(3L).codec == "stub" && out(3L).ok, s"text: ${out(3L)}")
    // sha is the real digest on every path
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(png).map("%02x".format(_)).mkString
    assert(out(1L).sha == sha)
  }

  test("a truncated image header degrades to the stub, never fails the task") {
    import spark.implicits._
    val broken = imageBytes("png", 20, 14).take(12) // magic intact, header cut
    val out = MediaPipeline.decode(
      Seq((9L, broken)).toDF("doc_id", "payload")).collect()
    assert(out.length == 1 && out.head.ok && out.head.codec == "stub",
      s"got ${out.toSeq}")
  }

  test("fixture payloads (text bytes) all stay on the stub codec — q42 parity preserved") {
    val codecs = MediaPipeline.decode(payloads).toDF()
      .select("codec").distinct().collect().map(_.getString(0)).toSet
    assert(codecs == Set("stub"), s"fixture decoded as $codecs")
  }
}
