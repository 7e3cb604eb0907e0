package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native codegen'd text-hash expressions.
  *
  * The higher-order-function formulations of SimHash (q38) and rolling-
  * window fingerprints (q33) evaluate an interpreted lambda per array
  * element: 60 bits × tokens (SimHash) and window × positions
  * (fingerprint) lambda dispatches PER ROW — the two slowest pipelines in
  * the round-1 bench once the noop sink stopped Catalyst from pruning them.
  * These expressions run the same folds as tight generated-Java loops
  * inside whole-stage codegen. Semantics match the HOF forms exactly
  * (verified bit-for-bit in TextHashesSpec), so the DuckDB oracles are
  * unchanged.
  *
  * All three fold over Unicode codepoints / long hashes with the same
  * arithmetic the DuckDB oracle uses: `(acc * 31 + cp) % 1e9+7` for the
  * polynomial hashes, per-bit ±1 majority for SimHash.
  */
object TextHashes {
  private[graft] val MOD = 1000000007L

  /** 31^(w-1) mod MOD — the drop-out coefficient of the rolling hash. */
  private[graft] def dropPow(window: Int): Long =
    (1 until window).foldLeft(1L)((a, _) => a * 31 % MOD)

  def simhash60(h: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(h)))
  def poly_hash(text: Column): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(text)))
  def min_window_hash(text: Column, window: Int): Column =
    ExpressionUtils.column(MinWindowHash(ExpressionUtils.expression(text), window))
}

/** 60-bit SimHash of an `array<bigint>` of 60-bit token hashes: bit j of
  * the result is set iff more tokens have bit j set than not. A null
  * element counts −1 for every bit, matching the HOF `CASE WHEN NULL`
  * semantics (never occurs on md5-derived inputs). */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](60)
    var k = 0
    val n = arr.numElements()
    while (k < n) {
      if (arr.isNullAt(k)) {
        var j = 0; while (j < 60) { counts(j) -= 1; j += 1 }
      } else {
        val h = arr.getLong(k)
        var j = 0
        while (j < 60) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      k += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[60];
         |int $n = $a.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k)) {
         |    for (int $j = 0; $j < 60; $j++) $counts[$j]--;
         |  } else {
         |    long $h = $a.getLong($k);
         |    for (int $j = 0; $j < 60; $j++) {
         |      if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 60; $j++) if ($counts[$j] > 0) $out |= 1L << $j;
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Polynomial hash of a string's codepoints: fold `(acc*31 + cp) % 1e9+7`.
  * Equals the HOF `aggregate(split(text,''), 0L, ...)` form and DuckDB's
  * `list_reduce` over `ascii(c)`. */
case class PolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % TextHashes.MOD
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $a.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31 + $cp) % ${TextHashes.MOD}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Minimum polynomial hash over all `window`-codepoint substrings, computed
  * with the Rabin–Karp rolling recurrence — O(len) instead of the HOF
  * form's O(window·len). NULL when the text has fewer than `window`
  * codepoints (same as the HOF `CASE WHEN length(text) < w THEN NULL`). */
case class MinWindowHash(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window > 0, "window must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_window_hash"

  override def nullSafeEval(input: Any): Any = {
    val cps = input.toString.codePoints().toArray
    if (cps.length < window) null
    else {
      val P = TextHashes.MOD
      val drop = TextHashes.dropPow(window)
      var h = 0L
      var i = 0
      while (i < window) { h = (h * 31 + cps(i)) % P; i += 1 }
      var min = h
      while (i < cps.length) {
        h = (h - cps(i - window) * drop % P + P) % P
        h = (h * 31 + cps(i)) % P
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cps = ctx.freshName("cps")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      val P = s"${TextHashes.MOD}L"
      val drop = s"${TextHashes.dropPow(window)}L"
      s"""
         |int[] $cps = $a.toString().codePoints().toArray();
         |if ($cps.length < $window) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $window; $i++) $h = ($h * 31 + $cps[$i]) % $P;
         |  long $min = $h;
         |  for (; $i < $cps.length; $i++) {
         |    $h = ($h - $cps[$i - $window] * $drop % $P + $P) % $P;
         |    $h = ($h * 31 + $cps[$i]) % $P;
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinWindowHash =
    copy(child = newChild)
}
