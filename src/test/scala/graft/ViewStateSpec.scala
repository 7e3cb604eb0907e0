package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ViewState

case class FactRow(o_orderkey: Long, custkey: Long, o_orderstatus: String)

/** operators/ViewState: the incrementally-maintained join view. The
  * invariants that make it production-usable:
  *  - any interleaving of left/right appends yields a merged view equal
  *    to the from-scratch join of the unioned inputs (bilinearity);
  *  - retractions cancel exactly the pairs their rows produced — merged
  *    equals the join of the survivors, and fully-cancelled rows vanish;
  *  - multiplicities are true z-set counts (a duplicated input row
  *    doubles its pairs; retracting one copy halves them);
  *  - optimize collapses the delta rows without changing the merged view.
  */
class ViewStateSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_viewstate").toString

  private def orders: DataFrame =
    spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey").as("custkey"),
        col("o_orderstatus"))

  private def cust: DataFrame =
    spark.read.parquet(s"${sf("sf0.001")}/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))

  private def scratch(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, Seq("custkey"))
      .groupBy(l.columns.map(col) ++ Seq(col("c_mktsegment")): _*)
      .agg(count(lit(1)).as("mult"))

  private def same(a: DataFrame, b: DataFrame): Boolean = {
    val bb = b.select(a.columns.map(col): _*)
    a.exceptAll(bb).isEmpty && bb.exceptAll(a).isEmpty
  }

  test("interleaved appends merged == from-scratch join, exactly") {
    val dir = tmp()
    ViewState.build(orders.filter(col("o_orderkey") % 3 === 0),
      cust.filter(col("custkey") % 2 === 0), Seq("custkey"), dir)
    ViewState.appendLeft(spark, orders.filter(col("o_orderkey") % 3 === 1), dir)
    ViewState.appendRight(spark, cust.filter(col("custkey") % 2 === 1), dir)
    ViewState.appendLeft(spark, orders.filter(col("o_orderkey") % 3 === 2), dir)
    assert(same(ViewState.merged(spark, dir), scratch(orders, cust)))
  }

  test("retractions == join over the survivors; cancelled rows vanish") {
    val dir = tmp()
    ViewState.build(orders, cust, Seq("custkey"), dir)
    ViewState.retractLeft(spark, orders.filter(col("o_orderkey") % 5 === 0), dir)
    ViewState.retractRight(spark, cust.filter(col("custkey") % 7 === 3), dir)
    val survivors = scratch(orders.filter(col("o_orderkey") % 5 =!= 0),
      cust.filter(col("custkey") % 7 =!= 3))
    val merged = ViewState.merged(spark, dir)
    assert(same(merged, survivors))
    // a retracted customer's pairings are gone even though fact rows live
    assert(merged.filter(col("custkey") % 7 === 3).isEmpty)
  }

  test("multiplicities are z-set counts under duplicate input rows") {
    import spark.implicits._
    val dir = tmp()
    val l = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "lv")
    val r = Seq((1L, "X"), (2L, "Y")).toDF("k", "rv")
    ViewState.build(l, r, Seq("k"), dir)
    val m1 = ViewState.merged(spark, dir).collect()
      .map(x => (x.getAs[Long]("k"), x.getAs[Long]("mult"))).toMap
    assert(m1 === Map(1L -> 2L, 2L -> 1L))
    // retract ONE copy of the duplicated left row: mult halves, not drops
    ViewState.retractLeft(spark, Seq((1L, "a")).toDF("k", "lv"), dir)
    val m2 = ViewState.merged(spark, dir).collect()
      .map(x => (x.getAs[Long]("k"), x.getAs[Long]("mult"))).toMap
    assert(m2 === Map(1L -> 1L, 2L -> 1L))
  }

  test("optimize collapses deltas, preserves merged, refuses in-place") {
    val dir = tmp(); val out = tmp()
    ViewState.build(orders.filter(col("o_orderkey") % 2 === 0),
      cust, Seq("custkey"), dir)
    ViewState.appendLeft(spark, orders.filter(col("o_orderkey") % 2 === 1), dir)
    ViewState.retractLeft(spark, orders.filter(col("o_orderkey") % 5 === 0), dir)
    val before = ViewState.merged(spark, dir)
    val rowsBefore = spark.read.parquet(s"$dir/view").count()
    ViewState.optimize(spark, dir, out)
    // cancelled pairs are physically gone from the output generation
    assert(spark.read.parquet(s"$out/view").count() < rowsBefore)
    assert(spark.read.parquet(s"$out/view").filter(col("__mult") <= 0).isEmpty)
    assert(same(before, ViewState.merged(spark, out)))
    intercept[IllegalArgumentException] { ViewState.optimize(spark, dir, dir) }
  }

  test("ingest returns exactly the view delta it appended") {
    val dir = tmp()
    ViewState.build(orders.filter(col("o_orderkey") % 2 === 0),
      cust, Seq("custkey"), dir)
    val before = spark.read.parquet(s"$dir/view")
    val nBefore = before.count()
    val d = ViewState.appendLeft(spark,
      orders.filter(col("o_orderkey") % 2 === 1), dir)
    val after = spark.read.parquet(s"$dir/view")
    assert(after.count() === nBefore + d.count())
    // the returned rows ARE the appended rows (multiset containment both
    // ways against the file-level delta)
    val fileDelta = after.exceptAll(before.select(after.columns.map(col): _*))
    assert(d.select(after.columns.map(col): _*).exceptAll(fileDelta).isEmpty)
    assert(fileDelta.exceptAll(d.select(after.columns.map(col): _*)).isEmpty)
    // a retraction returns its negative delta, usable for downstream folds
    val r = ViewState.retractLeft(spark,
      orders.filter(col("o_orderkey") % 2 === 1), dir)
    assert(r.filter(col("__mult") =!= -1L).isEmpty && r.count() === d.count())
  }

  test("a streaming fact feed maintains the view via foreachBatch deltas") {
    // the streaming intake for the standing join view: the fact side
    // arrives as micro-batches (foreachBatch -> appendLeft, O(batch) per
    // fold), the dimension gains a late slice BETWEEN fact batches — the
    // merged view must still equal the from-scratch join, because each
    // delta joined the other side's store AS OF its own arrival and the
    // telescoping sum closes over any interleaving
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = tmp()
    val factAll = orders.select("o_orderkey", "custkey", "o_orderstatus")
    ViewState.build(factAll.limit(0), cust.filter(col("custkey") % 2 === 0),
      Seq("custkey"), dir)
    val rows = factAll.collect()
      .map(r => FactRow(r.getLong(0), r.getLong(1), r.getString(2)))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val in = MemoryStream[FactRow]
    val q = in.toDF().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) { ViewState.appendLeft(spark, b, dir); () }
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      // the dimension's other half lands between fact batches
      ViewState.appendRight(spark, cust.filter(col("custkey") % 2 === 1), dir)
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      assert(same(ViewState.merged(spark, dir), scratch(factAll, cust)))
    } finally q.stop()
  }

  test("build refuses colliding non-key columns") {
    import spark.implicits._
    val l = Seq((1L, "a")).toDF("k", "v")
    val r = Seq((1L, "b")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      ViewState.build(l, r, Seq("k"), tmp())
    }
  }

  test("bucket width is a build argument persisted in meta; 8 and 128 agree") {
    // the r12 scale knob: bucket-granularity pruning must be sizeable per
    // deployment, and the built width must be honored by every later read
    // — identical merged results at both widths, physical layout at the
    // built width (not the old fixed 32)
    val widths = Seq(8, 128).map { nb =>
      val dir = tmp()
      ViewState.build(orders.filter(col("o_orderkey") % 3 === 0),
        cust.filter(col("custkey") % 2 === 0), Seq("custkey"), dir, nb)
      ViewState.appendLeft(spark, orders.filter(col("o_orderkey") % 3 =!= 0), dir)
      ViewState.appendRight(spark, cust.filter(col("custkey") % 2 === 1), dir)
      ViewState.retractLeft(spark, orders.filter(col("o_orderkey") % 5 === 0), dir)
      val survivors = scratch(orders.filter(col("o_orderkey") % 5 =!= 0), cust)
      assert(same(ViewState.merged(spark, dir), survivors), s"width $nb")
      val buckets = new java.io.File(s"$dir/left_store").listFiles()
        .map(_.getName).filter(_.startsWith("__bucket="))
        .map(_.stripPrefix("__bucket=").toLong)
      assert(buckets.forall(b => b >= 0 && b < nb), s"bucket out of range at $nb")
      buckets.max
    }
    // at 128 the layout actually uses the wider space (fixed-32 would cap
    // every bucket id below 32)
    assert(widths(1) >= 32, s"128-bucket store never exceeded bucket ${widths(1)}")
  }

  test("a pre-r12 meta file (no bucket line) reads as the old fixed 32") {
    val dir = tmp()
    ViewState.build(orders.filter(col("o_orderkey") % 3 === 0), cust,
      Seq("custkey"), dir)
    // strip the bucket-count line, simulating a store built before r12
    val metaFile = new java.io.File(s"$dir/keys.txt")
    val lines = scala.io.Source.fromFile(metaFile).getLines().toList
    java.nio.file.Files.write(metaFile.toPath,
      lines.take(4).mkString("\n").getBytes("UTF-8"))
    ViewState.appendLeft(spark, orders.filter(col("o_orderkey") % 3 =!= 0), dir)
    assert(same(ViewState.merged(spark, dir), scratch(orders, cust)))
  }
}
