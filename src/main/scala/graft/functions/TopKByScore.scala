package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** One scored candidate. */
case class Scored(id: Long, score: Double)

/** Typed top-k-by-score aggregate (SURVEY.md §7.3's "top-k-by-similarity"
  * Aggregator — one of the genuinely custom aggregates this project needs).
  *
  * Each partition keeps a bounded min-heap of size k; merge combines heaps —
  * so a grouped top-k moves only k rows per group per partition across the
  * shuffle instead of sorting every scored row (the `row_number` window
  * formulation shuffles and sorts everything). At 100 TB that is the
  * difference between a k-row combine and a full sort of the scored
  * candidate set.
  *
  * Determinism: ties on score break toward the smaller id (the total order
  * of `ORDER BY score DESC, id ASC`); reduce/merge are order-insensitive
  * because the heap keeps the best k under that total order regardless of
  * arrival order.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[Scored], Seq[Scored]] {

  // min-heap under (score asc, id desc): head = the entry to evict —
  // worst score, and among equal scores the larger id
  private def heapOrder: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: mutable.PriorityQueue[Scored] =
    mutable.PriorityQueue.empty(heapOrder)

  override def reduce(heap: mutable.PriorityQueue[Scored],
                      in: (Long, Double)): mutable.PriorityQueue[Scored] = {
    val s = Scored(in._1, in._2)
    if (heap.size < k) heap.enqueue(s)
    else {
      val worst = heap.head
      if (s.score > worst.score || (s.score == worst.score && s.id < worst.id)) {
        heap.dequeue(); heap.enqueue(s)
      }
    }
    heap
  }

  override def merge(a: mutable.PriorityQueue[Scored],
                     b: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] =
    b.foldLeft(a)((h, s) => reduce(h, (s.id, s.score)))

  /** best-first: score desc, id asc. */
  override def finish(heap: mutable.PriorityQueue[Scored]): Seq[Scored] =
    heap.toSeq.sortBy(s => (-s.score, s.id))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
    Encoders.kryo[mutable.PriorityQueue[Scored]]
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopKByScore {
  /** Untyped Column form: `df.groupBy(...).agg(top_k(5)(id, score))`
    * → ARRAY<STRUCT<id BIGINT, score DOUBLE>> best-first. */
  def top_k(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopKByScore(k))
    (id: Column, score: Column) => agg(id, score)
  }
}
