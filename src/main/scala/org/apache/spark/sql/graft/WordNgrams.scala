package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n)` — a table-generating function (the custom
  * `Generator` arm of SURVEY §7.3 / §2.9's "tokenizer UDTF"): tokenizes a
  * string (lowercase, trim, split on whitespace — the library's shared
  * `toks` semantics) and emits one `(pos, ngram)` ROW per word n-gram,
  * space-joined.
  *
  * Versus the expression form (`explode(shingles3(toks(text)))`, q34):
  * a Generator never materializes the token array OR the n-gram array as
  * column values — rows stream out of `GenerateExec` one at a time, so the
  * peak memory per input row is one n-gram, not `O(tokens)`. On 100 TB of
  * long documents that is the difference between a streaming pipeline
  * stage and per-row array allocation pressure.
  *
  * Generators execute inside `GenerateExec` (the same operator explode
  * uses), not expression codegen — `CodegenFallback` here only covers the
  * unused scalar path.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects (string, n >= 1), got (${child.dataType}, $n)")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Iterator.empty
    else {
      val s = raw.asInstanceOf[UTF8String].toString.trim.toLowerCase
      if (s.isEmpty) Iterator.empty
      else {
        val toks = s.split("\\s+")
        if (toks.length < n) Iterator.empty
        else (0 to toks.length - n).iterator.map { i =>
          InternalRow(i, UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}
