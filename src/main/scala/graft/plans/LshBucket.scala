package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH bucket id as ONE native expression.
  *
  * bucket = Σ_p [ (Σ_d emb[d] * planes[p*dim+d]) >= 0 ] << p
  *
  * Equivalent to `numPlanes` DotFold-against-literal columns summed, but a
  * single tight loop: the literal-array formulation generates ~8×64
  * constant-folding expression nodes whose janino compilation alone costs
  * seconds per session; this compiles to a dozen lines. Per-plane dot
  * keeps the ascending-d left-fold order (0.0 init), matching the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, list_transform(...)))` exactly.
  */
case class LshBucketExpr(child: Expression, planes: Array[Double],
                         numPlanes: Int, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val isF = elemIsFloat
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val v = if (arr.isNullAt(d)) 0.0
        else if (isF) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc = acc + v * planes(p * dim + d)
        d += 1
      }
      if (acc >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val b = ctx.freshName("bucket"); val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long $b = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $v = $a.isNullAt($d) ? 0.0 : (double) $a.$get($d);
         |    $acc = $acc + $v * $planesRef[$p * $dim + $d];
         |  }
         |  if ($acc >= 0) $b |= (1L << $p);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket"
}

object LshBucketExpr {
  /** Column wrapper via the session function registry (the registered
    * builder closure captures the plane matrix; name keyed by shape so
    * different configs coexist).
    */
  def apply(spark: SparkSession, emb: Column, planes: Array[Double],
            numPlanes: Int, dim: Int): Column = {
    val name = s"lsh_bucket_${numPlanes}_$dim"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, { exprs: Seq[Expression] => LshBucketExpr(exprs.head, planes, numPlanes, dim) },
      "built-in")
    org.apache.spark.sql.functions.call_function(name, emb)
  }
}

/** The REAL-VALUED half of [[LshBucketExpr]]: the per-plane accumulators
  * themselves (`proj[p] = Σ_d emb[d] * planes[p*dim+d]`, ascending-d
  * left fold from 0.0 — the same bit pattern the HOF
  * `transform(…, aggregate(…))` formulation produces, and the order the
  * DuckDB oracle replays), WITHOUT the `>= 0` quantization. One tight
  * codegen'd loop instead of rpDim×dim interpreted HOF nodes — the
  * Johnson–Lindenstrauss projection of Similarity.rpTopK. Null elements
  * contribute 0.0; inputs shorter than `dim` are zero-padded.
  */
case class RpProjectExpr(child: Expression, planes: Array[Double],
                         numPlanes: Int, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rp_project expects array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val isF = elemIsFloat
    val out = new Array[Double](numPlanes)
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val v = if (arr.isNullAt(d)) 0.0
        else if (isF) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc = acc + v * planes(p * dim + d)
        d += 1
      }
      out(p) = acc
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val res = ctx.freshName("res"); val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $res = new double[$numPlanes];
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $v = $a.isNullAt($d) ? 0.0 : (double) $a.$get($d);
         |    $acc = $acc + $v * $planesRef[$p * $dim + $d];
         |  }
         |  $res[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RpProjectExpr =
    copy(child = newChild)

  override def prettyName: String = "rp_project"
}

object RpProjectExpr {
  def apply(spark: SparkSession, emb: Column, planes: Array[Double],
            numPlanes: Int, dim: Int): Column = {
    val name = s"rp_project_${numPlanes}_$dim"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, { exprs: Seq[Expression] => RpProjectExpr(exprs.head, planes, numPlanes, dim) },
      "built-in")
    org.apache.spark.sql.functions.call_function(name, emb)
  }
}
