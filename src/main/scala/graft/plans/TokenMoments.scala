package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the token-distribution moments of a token
  * array in ONE narrow pass — `struct(n_tokens, n_types, sum_c2)` with
  * Σc² the sum of squared per-token counts. These three longs are the
  * sufficient statistics for the Gini–Simpson diversity
  * ((T² − Σc²)/T², [[graft.operators.TextAnalysis.simpsonDiversity]]),
  * type-token ratio, and any other concentration metric over the
  * document's unigram distribution.
  *
  * The declarative route (explode → (doc, term) hash agg → doc-keyed
  * moment agg) SHUFFLES EVERY TOKEN OF THE CORPUS twice to compute what
  * is a per-document quantity; this expression computes the same three
  * numbers in-row with a per-document hash map — at 100 TB the Simpson
  * scan becomes a pure map with zero exchanges, the same plan upgrade
  * [[NgramDupFrac]] bought the repetition filter. The hash map is
  * document-vocabulary-sized, bounded by the row, not the corpus.
  *
  * Exactness is unchanged: counts are exact longs either way; the one
  * double division stays in the caller.
  */
case class TokenMoments(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_moments expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("sum_c2", LongType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    TokenMoments.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenMoments.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenMoments =
    copy(child = newChild)

  override def prettyName: String = "token_moments"
}

object TokenMoments {

  /** Column API, registered as a temp function so the DSL can call it. */
  def apply(spark: org.apache.spark.sql.SparkSession,
            tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_moments", { exprs: Seq[Expression] => TokenMoments(exprs.head) },
      "built-in")
    org.apache.spark.sql.functions.call_function("token_moments", tokens)
  }

  /** One pass, one doc-vocabulary-sized map; static for generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val sz = arr.numElements()
    val counts =
      new java.util.HashMap[UTF8String, java.lang.Long](math.max(16, sz * 2))
    var i = 0
    while (i < sz) {
      val t = arr.getUTF8String(i)
      val c = counts.get(t)
      counts.put(t, if (c == null) 1L else c.longValue() + 1L)
      i += 1
    }
    var sumC2 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().longValue(); sumC2 += c * c }
    InternalRow(sz.toLong, counts.size.toLong, sumC2)
  }
}
