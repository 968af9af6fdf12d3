package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.plans._

/** The engine's SQL function surface, installable two ways:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build — the
  *    idiomatic library route (SparkSessionExtensions.injectFunction), no
  *    code changes in the user's job;
  *  - [[GraftFunctions.registerAll]] on an already-running session (what
  *    the query surface itself uses via the per-function helpers).
  *
  * Both expose the same names, so `SELECT minhash_sig(text, 3, 8)` works
  * from pure SQL — the custom Catalyst expressions are first-class
  * functions, not just Column-API helpers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getCanonicalName, name),
        builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  /** name -> expression builder, shared by both installation routes. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_fold"      -> (es => DotFold(es(0), es(1))),
    "word_shingles" -> (es => WordShinglesExpr(es(0), intArg(es(1), "word_shingles"))),
    "minhash_sig"   -> (es => MinHashSigExpr(es(0),
      intArg(es(1), "minhash_sig"), intArg(es(2), "minhash_sig"))),
    "simhash64"     -> (es => SimHash64Expr(es(0))),
    "char_ngrams"   -> (es => CharNgramsExpr(es(0), intArg(es(1), "char_ngrams"))),
    "array_jaccard" -> (es => ArrayJaccardExpr(es(0), es(1))),
    "ngram_dup_frac" -> (es => NgramDupFrac(es(0), intArg(es(1), "ngram_dup_frac"))),
    "token_moments" -> (es => TokenMoments(es(0))))

  /** Runtime registration on an existing session (idempotent). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
