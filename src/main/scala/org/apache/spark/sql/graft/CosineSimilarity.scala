package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for cosine similarity of two float vectors.
  *
  * Lives under `org.apache.spark.sql` (the standard pattern for native
  * expression libraries) because the Column↔Expression bridge and
  * `AbstractDataType` are `private[sql]`.
  *
  * Why an Expression and not the higher-order-function formulation
  * (`aggregate(zip_with(...))`) or a Scala UDF: HOFs evaluate interpreted
  * with a lambda dispatch per element, and a UDF adds serialization at the
  * row boundary; this expression participates in whole-stage codegen — the
  * generated loop reads the float arrays directly, keeping q39/q40's
  * 64-float dot products inside the codegen'd stage. Semantics match the
  * HOF form exactly: double accumulation in array order (so DuckDB oracle
  * parity is preserved bit-for-bit), similarity over the common prefix of
  * unequal-length inputs, NaN for zero vectors.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL registration for one session (`SELECT cosine_sim(a, b)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      { exprs: Seq[Expression] => CosineSimilarity(exprs(0), exprs(1)) },
      "built-in")
}

/** `SparkSessionExtensions` hook: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` makes
  * `cosine_sim` a SQL function and installs the Levenshtein length-bound
  * optimizer rule and the native as-of join planner strategy in every
  * session (GraftSession wires it in by default). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    // the native text-hash expressions double as SQL functions, so the
    // whole operator surface is reachable from spark.sql(...) too
    e.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getCanonicalName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getCanonicalName, "simhash60"),
      (exprs: Seq[Expression]) => SimHash60(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("min_window_hash"),
      new ExpressionInfo(classOf[MinWindowHash].getCanonicalName, "min_window_hash"),
      (exprs: Seq[Expression]) => MinWindowHash(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("ngram_distincts"),
      new ExpressionInfo(classOf[NgramDistincts].getCanonicalName, "ngram_distincts"),
      (exprs: Seq[Expression]) => NgramDistincts(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getCanonicalName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hll_regs"),
      new ExpressionInfo(classOf[HllRegs].getCanonicalName, "hll_regs"),
      (exprs: Seq[Expression]) => HllRegs(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("hist_regs"),
      new ExpressionInfo(classOf[HistRegs].getCanonicalName, "hist_regs"),
      (exprs: Seq[Expression]) => HistRegs(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getCanonicalName,
        "sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getCanonicalName, "word_ngrams"),
      (exprs: Seq[Expression]) => WordNgrams(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectOptimizerRule(_ => LevenshteinBoundRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
