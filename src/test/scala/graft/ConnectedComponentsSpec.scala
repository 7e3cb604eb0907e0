package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Min-label propagation + pointer jumping: chains, cycles, disjoint
  * components, and invariance to partitioning and iteration-count slack. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], partitions: Int = 1): Map[Long, Long] = {
    val df = edges.toDF("src", "dst").repartition(partitions)
    val out = ConnectedComponents.components(df)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.unpersist()
    m
  }

  test("chain, cycle, and disjoint components all label with the min id") {
    // chain 1-2-3-4, cycle 10-11-12-10, pair 20-21, isolated edge 30-31
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (30L, 31L))
    val m = comps(edges)
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("long path converges within the iteration budget (pointer jumping)") {
    // a 64-node path: plain one-hop propagation needs 63 rounds — pointer
    // jumping must close it within the default 25
    val edges = (0L until 63L).map(i => (i, i + 1))
    val m = comps(edges, partitions = 8)
    assert(m.size == 64 && m.values.forall(_ == 0L))
  }

  test("result is independent of input partitioning and edge orientation") {
    val edges = Seq((5L, 3L), (3L, 9L), (9L, 7L), (2L, 8L))
    val a = comps(edges, partitions = 1)
    val b = comps(edges.map(_.swap), partitions = 7)
    assert(a == b)
    assert(a(7L) == 3L && a(8L) == 2L)
  }

  test("empty edge set yields an empty result") {
    val df = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = ConnectedComponents.components(df)
    assert(out.count() == 0)
    out.unpersist()
  }
}
