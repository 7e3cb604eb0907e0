package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native mergeable HyperLogLog register aggregate — the custom Catalyst
  * AGGREGATE counterpart to the scalar expressions in [[TextHashes]].
  *
  * Input: the 56-bit md5-prefix hash q126 derives per element. State: the
  * 64 register maxima (rank = 51 − bitlen(h div 64), register = h mod
  * 64) — exactly the numbers q126's explode+groupBy(register) pipeline
  * computes, so the SAME DuckDB oracle verifies both forms. Output:
  * struct(n_regs, s_e) with s_e = Σ 2^(51−m) over hit registers plus 2^51
  * per empty register — the integer-ized harmonic sum the shared-verbatim
  * estimate expression consumes (a raw Σ2^−m double fold would be
  * summation-order-dependent; see q126's Scaladoc).
  *
  * Scale design: this is the form that actually ships at 100 TB — each
  * partition folds its rows into a 512-byte buffer, partial buffers merge
  * by elementwise max, and ONE row per group crosses the shuffle. The SQL
  * form shuffles |groups|·64 register rows and needs two aggregations;
  * the aggregate needs one ObjectHashAggregate. Deterministic: max is
  * order-independent, so partial aggregation and AQE re-partitioning
  * cannot change the result.
  */
case class HllRegs(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_regs", LongType, nullable = false),
    StructField("s_e", LongType, nullable = false)))
  override def prettyName: String = "hll_regs"

  override def createAggregationBuffer(): Array[Long] = Array.fill(64)(-1L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = (h % 64).toInt
      val w = h / 64
      val rank = if (w == 0) 51L else 51L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(j)) buf(j) = rank
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var nRegs = 0L
    var sHit = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) >= 0) { nRegs += 1; sHit += 1L << (51 - buf(i)).toInt }
      i += 1
    }
    val sE = sHit + (64 - nRegs) * 2251799813685248L // empty regs at 2^51
    new GenericInternalRow(Array[Any](nRegs, sE))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegs =
    copy(child = newChild)
}

object Sketches {
  /** Column-API entry point: `df.groupBy(...).agg(hll_regs($"h"))`. */
  def hll_regs(h: Column): Column =
    ExpressionUtils.column(
      HllRegs(ExpressionUtils.expression(h)).toAggregateExpression())
}
