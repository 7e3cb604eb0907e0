package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import graft.operators.{ClusterState, ConnectedComponents}

/** operators/ClusterState: the standing cluster-label table. Invariant:
  * labels grown by appendEdges (CC over label STARS + the delta only)
  * are IDENTICAL to from-scratch CC over the cumulative edge set — the
  * star reconstruction preserves old connectivity and old labels are
  * member ids, so min-label CC re-derives the global minimum.
  */
class ClusterStateSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_clusterstate").toString

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The CURRENT assignment resolved through the API (the label table is
    * generational — no fixed on-disk path). */
  private def current(dir: String): DataFrame =
    ClusterState.clusters(spark, dir).select("id", "cluster_id")

  private def scratch(e: DataFrame): Set[(Long, Long)] = {
    val c = ConnectedComponents.components(e)
    val out = labelSet(c.select("id", "cluster_id"))
    c.unpersist()
    out
  }

  test("grown labels == from-scratch CC over the cumulative edge set") {
    val dir = tmp()
    val e1 = edges(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L)
    val e2 = edges(3L -> 4L, 30L -> 31L, 11L -> 12L)
    ClusterState.build(e1, dir)
    ClusterState.appendEdges(spark, e2, dir)
    val grown = labelSet(current(dir))
    assert(grown === scratch(e1.unionByName(e2)))
  }

  test("a bridging edge merges two standing clusters; loser relabels") {
    val dir = tmp()
    ClusterState.build(edges(1L -> 2L, 5L -> 6L), dir)
    // bridge 2—5: the {5,6} cluster must relabel to min id 1
    ClusterState.appendEdges(spark, edges(2L -> 5L), dir)
    val grown = labelSet(current(dir))
    assert(grown === Set(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L))
    val sizes = ClusterState.clusters(spark, dir).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_size")).toMap
    assert(sizes === Map(1L -> 4L, 2L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("takedown splits a chain cluster via component-local re-clustering") {
    import spark.implicits._
    import graft.operators.DedupIndex
    val good = "the quick data row is a fine piece of text " +
      "and it keeps going with more useful words in the table"
    // para1 edits the last token (1 shingle differs: J≈0.90 vs good);
    // para2 edits a middle token (3 shingles differ: J≈0.73 vs good) —
    // their MUTUAL overlap drops to ≈0.65, under the 0.7 gate
    val para1 = good.replaceAll("table$", "ledger")
    val para2 = good.replaceAll("piece", "chunk")
    val fresh = "a completely different report text about weekly shipment " +
      "volumes and the carriers that move them across the region every day"
    val idxDir = java.nio.file.Files.createTempDirectory("graft_cl_rm_idx").toString
    def freshState(): String = {
      val dir = tmp()
      DedupIndex.build(Seq((1L, good), (2L, para1), (3L, para2), (10L, fresh),
        (20L, fresh), (21L, fresh)).toDF("doc_id", "text"), idxDir)
      // the near-dup graph: chain {1,2,3} through doc 1, exact-pair {20,21}
      ClusterState.build(edges(1L -> 2L, 1L -> 3L, 20L -> 21L), dir)
      dir
    }
    // deleting the chain's hub disconnects 2 and 3 (their mutual Jaccard
    // is under 0.7): the cluster SPLITS and the edgeless survivors drop;
    // the untouched {20,21} cluster is carried over unchanged
    val dir1 = freshState()
    ClusterState.removeDocs(spark, Seq(1L).toDF("doc_id"), dir1, idxDir)
    assert(labelSet(current(dir1))
      === Set(20L -> 20L, 21L -> 20L))
    // deleting a leaf keeps the remaining pair connected (re-verified
    // from the index's sigs, not from remembered edges)
    val dir2 = freshState()
    ClusterState.removeDocs(spark, Seq(3L).toDF("doc_id"), dir2, idxDir)
    assert(labelSet(current(dir2))
      === Set(1L -> 1L, 2L -> 1L, 20L -> 20L, 21L -> 20L))
    // removing an unclustered doc is a label no-op
    val before = labelSet(current(dir2))
    ClusterState.removeDocs(spark, Seq(10L).toDF("doc_id"), dir2, idxDir)
    assert(labelSet(current(dir2))
      === before)
  }

  test("generational migration: clustersAt(1) time-travels to the pre-append assignment") {
    val dir = tmp()
    ClusterState.build(edges(1L -> 2L, 5L -> 6L), dir)
    ClusterState.appendEdges(spark, edges(2L -> 5L), dir)
    // CURRENT sees the merged cluster...
    assert(labelSet(current(dir)) === Set(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L))
    // ...but generation 1 still answers with the pre-append assignment
    val asOf = labelSet(ClusterState.clustersAt(spark, dir, 1).select("id", "cluster_id"))
    assert(asOf === Set(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("chained maintenance stays exact across multiple batches") {
    val dir = tmp()
    val batches = Seq(
      edges(1L -> 2L, 7L -> 8L),
      edges(3L -> 4L),          // new component
      edges(2L -> 3L),          // merges {1,2} with {3,4}
      edges(8L -> 9L, 4L -> 7L) // chains everything into one
    )
    ClusterState.build(batches.head, dir)
    batches.tail.foreach(b => ClusterState.appendEdges(spark, b, dir))
    val grown = labelSet(current(dir))
    assert(grown === scratch(batches.reduce(_ unionByName _)))
    // everything reachable → one cluster labeled by the global min
    assert(grown.map(_._2) === Set(1L))
  }

  test("retention knobs: a rapid 5-publish chain keeps exactly keepLast + CURRENT") {
    import graft.operators.Generations
    val dir = tmp()
    // keepLast = 2 with a zero retention window: each publish retires
    // everything but the last 2 history entries (CURRENT's target is
    // always within them here) — the r12 knob, previously hard-coded
    val r = ClusterState.Retention(keepLast = 2, retentionHours = 0.0)
    ClusterState.build(edges(1L -> 2L), dir, r)
    Seq(edges(3L -> 4L), edges(5L -> 6L), edges(7L -> 8L), edges(2L -> 3L))
      .foreach(b => ClusterState.appendEdges(spark, b, dir, r))
    val hist = Generations.history(dir)
    assert(hist.map(_._1) === Seq(1, 2, 3, 4, 5), "history lines must survive retention")
    val onDisk = hist.filter { case (_, p) => new java.io.File(p).isDirectory }
    assert(onDisk.map(_._1) === Seq(4, 5),
      s"expected exactly the last keepLast generations on disk, got $onDisk")
    // the kept non-CURRENT generation still time-travels; a retired one
    // fails loudly instead of resolving to a dangling path
    assert(labelSet(ClusterState.clustersAt(spark, dir, 4).select("id", "cluster_id"))
      .nonEmpty)
    intercept[IllegalArgumentException] {
      ClusterState.clustersAt(spark, dir, 2).collect()
    }
    // CURRENT answers the cumulative graph
    assert(labelSet(current(dir)) === scratch(
      edges(1L -> 2L, 3L -> 4L, 5L -> 6L, 7L -> 8L, 2L -> 3L)))
  }
}
