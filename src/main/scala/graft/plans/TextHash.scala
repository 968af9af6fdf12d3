package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text-hashing primitives for the dedup operators, as native
  * codegen'd Catalyst expressions.
  *
  * Why expressions and not DataFrame algebra: the r2 formulation computed
  * word shingles via posexplode + window-lead (a shuffle by doc_id + sort)
  * and MinHash via an 8-column md5 aggregation whose
  * `conv(substr(md5(...)))` chain parses a BigInteger per hash — ~40 s of
  * the sf0.1 bench went to re-computing that subtree on both sides of the
  * LSH band self-join. Shingling and signature-building are per-DOCUMENT
  * scalar work, so the scalable shape is a narrow projection: one pass over
  * the text, no shuffle, no window, whole-stage codegen intact. The only
  * shuffles left in the dedup pipeline are the candidate equi-joins.
  *
  * All hashes stay bit-identical to the DuckDB oracle's portable algebra
  * (graft.functions.Portable): first 8 hex digits of md5 as an unsigned
  * 32-bit value, seeded as md5("{seed}#{shingle}").
  */
object TextHashUtil {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as an unsigned 32-bit value — numerically equal to
    * parsing the first 8 hex digits base-16 (Portable.hash32 / DuckDB
    * `('0x'||substr(md5(s),1,8))::BIGINT`), without hex-string + BigInteger.
    */
  def hash32(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val h = md.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  def hash32(s: String): Long = hash32(s.getBytes(StandardCharsets.UTF_8))

  /** xxhash64 twin of [[hash32]] (the [[graft.functions.Portable.fastHash]]
    * backend): low 32 bits of Spark's own XXH64 with the builtin's seed 42
    * — bit-identical to `xxhash64(s) & 0xFFFFFFFF` at the Column level, so
    * Column-algebra and native-expression hashes of the same canonical
    * string agree under either backend (asserted in PortableSpec).
    */
  def hash32Fast(bytes: Array[Byte]): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L) & 0xFFFFFFFFL

  def hash32Fast(s: String): Long = hash32Fast(s.getBytes(StandardCharsets.UTF_8))

  private def tokens(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  /** MinHash signature: per seed `i` in [0, numHashes), the min of
    * hash32("i#" + shingle) over the doc's word-k-shingles. Null when the
    * doc has fewer than k tokens (no shingles — the oracle filters these).
    * Duplicate shingles are harmless under min, so no dedup pass.
    */
  def minhashSig(text: UTF8String, k: Int, numHashes: Int): ArrayData =
    minhashSig(text, k, numHashes, fast = false)

  def minhashSig(text: UTF8String, k: Int, numHashes: Int, fast: Boolean): ArrayData = {
    val toks = tokens(text)
    if (toks.length < k) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val shingle = sb.toString
      var s = 0
      while (s < numHashes) {
        val key = s.toString + "#" + shingle
        val h = if (fast) hash32Fast(key) else hash32(key)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct word-k-shingles in first-occurrence order (empty array when
    * the doc has fewer than k tokens).
    */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  /** First 8 md5 bytes as a long (bit-equal to parsing the first 16 hex
    * digits as an unsigned 64-bit value — DuckDB
    * `('0x'||substr(md5(s),1,16))::UBIGINT` has the same bit pattern).
    */
  def hash64(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val h = md.digest(bytes)
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (h(i) & 0xffL); i += 1 }
    out
  }

  /** 64-bit SimHash over whitespace tokens: bit j set iff the sum of ±1
    * votes from each token's hash bit j is positive. Identical to the
    * per-(doc,bit) relational formulation, in one pass. 64 bits (not 32):
    * with 4 banding blocks the bucket key is 16 bits wide, so bucket
    * population scales as N/65536 — the 8-bit-band variant degenerated to
    * ~N²/256 candidate pairs at sf0.1 and would drown a real corpus.
    */
  def simhash64(text: UTF8String): Long = simhash64(text, fast = false)

  def simhash64(text: UTF8String, fast: Boolean): Long = {
    val toks = tokens(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val bs = toks(i).getBytes(StandardCharsets.UTF_8)
      val h =
        if (fast) org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bs, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bs.length, 42L)
        else hash64(bs)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Exact Jaccard of two string arrays already distinct per side:
    * |A∩B| / (|A|+|B|-|A∩B|) — integer counts, so the double division is
    * bit-identical to the oracle's CAST(len(list_intersect)…) form.
    * Two empty sets → null (DuckDB computes 0/0 as NULL; Spark NaN would
    * PASS a `>= threshold` filter under nan-safe compare and emit phantom
    * pairs).
    */
  def arrayJaccard(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return null
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) { if (set.contains(b.getUTF8String(j))) inter += 1; j += 1 }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Distinct character n-grams (first-occurrence order); empty array for
    * docs shorter than n chars — matching DuckDB `range(1, len-1)` being
    * empty, NOT a descending Spark `sequence` emitting bogus grams (r2 bug).
    * Slicing is by CODE POINT, not UTF-16 unit, so non-BMP characters are
    * never split into lone surrogates (DuckDB substr counts code points).
    */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // code-point boundaries (cheap single pass; == char indices for ASCII)
    val nCp = s.codePointCount(0, s.length)
    if (nCp < n) return new GenericArrayData(Array.empty[Any])
    val bounds = new Array[Int](nCp + 1)
    var ci = 0
    var cp = 0
    while (cp < nCp) { bounds(cp) = ci; ci = s.offsetByCodePoints(ci, 1); cp += 1 }
    bounds(nCp) = s.length
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= nCp) { seen.add(s.substring(bounds(i), bounds(i + n))); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  /** ALL word-k-shingles in position order, duplicates kept — the multiset
    * twin of [[wordShingles]] for occurrence-weighted operators (weighted
    * MinHash tf tables). Empty array when the doc has fewer than k tokens.
    * Value-equal to the Column-algebra
    * `transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(toks,i,k)))`
    * it replaces — that HOF form re-evaluated the full-document `split`
    * once PER ELEMENT (interpreted lambdas do no common-subexpression
    * reuse), i.e. O(tokens²) string work per doc.
    */
  def wordShinglesAll(text: UTF8String, k: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - k + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (Schleimer et al. 2003) fused text→longs:
    * hash32 of every positional word-k-gram, then the DISTINCT minima of
    * every w-gram sliding window (whole-array min when fewer than w grams).
    * Null when the doc has fewer than k tokens (callers filter those).
    * Bit-equal to the Column algebra it replaces
    * (hash32(concat_ws(' ', slice(toks,i,k))) → array_min over slices →
    * array_distinct); the window pass uses a monotone deque so the whole
    * fingerprint set is O(grams) per doc instead of O(grams·w) interpreted
    * lambda evals.
    */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int,
                         fast: Boolean): ArrayData = {
    val toks = tokens(text)
    if (toks.length < k) return null
    val n = toks.length - k + 1
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      hs(i) = if (fast) hash32Fast(sb.toString) else hash32(sb.toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    if (n < w) {
      var m = Long.MaxValue
      var x = 0
      while (x < n) { if (hs(x) < m) m = hs(x); x += 1 }
      seen.add(m)
    } else {
      // monotone deque of indices; front = min of the current window
      val dq = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      var x = 0
      while (x < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(x)) tail -= 1
        dq(tail) = x; tail += 1
        if (dq(head) <= x - w) head += 1
        if (x >= w - 1) seen.add(hs(dq(head)))
        x += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var m = 0
    while (it.hasNext) { out(m) = it.next().longValue(); m += 1 }
    new GenericArrayData(out)
  }
}

/** Base for the string→X expressions below: null-safe, codegen delegates to
  * the (JIT-compiled) TextHashUtil static — the loop body never interprets.
  */
abstract class TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.catalogString}")
  }
  /** Java call on TextHashUtil given the input variable name. */
  protected def staticCall(input: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = ${staticCall(a)};")
}

case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int,
                          fast: Boolean = false) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.minhashSig(input.asInstanceOf[UTF8String], k, numHashes, fast)
  override protected def staticCall(input: String): String =
    s"graft.plans.TextHashUtil.minhashSig($input, $k, $numHashes, $fast)"
  // the helper returns null for <k-token docs even on non-null input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = ${staticCall(a)};
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

case class WordShinglesExpr(child: Expression, k: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.wordShingles(input.asInstanceOf[UTF8String], k)
  override protected def staticCall(input: String): String =
    s"graft.plans.TextHashUtil.wordShingles($input, $k)"
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

case class WordShinglesAllExpr(child: Expression, k: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.wordShinglesAll(input.asInstanceOf[UTF8String], k)
  override protected def staticCall(input: String): String =
    s"graft.plans.TextHashUtil.wordShinglesAll($input, $k)"
  override protected def withNewChildInternal(newChild: Expression): WordShinglesAllExpr =
    copy(child = newChild)
  override def prettyName: String = "word_shingles_all"
}

case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int,
                                  fast: Boolean = false) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.winnowFingerprints(input.asInstanceOf[UTF8String], k, w, fast)
  override protected def staticCall(input: String): String =
    s"graft.plans.TextHashUtil.winnowFingerprints($input, $k, $w, $fast)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = ${staticCall(a)};
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

case class SimHash64Expr(child: Expression, fast: Boolean = false)
    extends TextHashExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash64(input.asInstanceOf[UTF8String], fast)
  override protected def staticCall(input: String): String =
    s"graft.plans.TextHashUtil.simhash64($input, $fast)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Jaccard of two distinct-element string arrays (see
  * TextHashUtil.arrayJaccard); codegen'd single pass per pair — the HOF
  * array_intersect/array_union pair built two hash tables per invocation.
  */
case class ArrayJaccardExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"array_jaccard expects array<string> inputs, got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null when both sides are empty sets
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.arrayJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("jac")
      s"""
         |java.lang.Double $tmp = graft.plans.TextHashUtil.arrayJaccard($a, $b);
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccardExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_jaccard"
}

case class CharNgramsExpr(child: Expression, n: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.charNgrams(input.asInstanceOf[UTF8String], n)
  override protected def staticCall(input: String): String =
    s"graft.plans.TextHashUtil.charNgrams($input, $n)"
  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

/** Column API via the session function registry (same route as DotFold). */
object TextHash {
  private def reg(spark: SparkSession, name: String,
                  b: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")

  import org.apache.spark.sql.functions.call_function

  def minhashSig(spark: SparkSession, text: Column, k: Int, numHashes: Int): Column = {
    // Backend captured at plan-build (the Portable.fastHash contract);
    // baked into the registered name so md5- and xx-backed plans coexist.
    val fast = graft.functions.Portable.fastHash
    val n = s"graft_minhash_sig_${k}_${numHashes}_${if (fast) "xx" else "md5"}"
    reg(spark, n, es => MinHashSigExpr(es.head, k, numHashes, fast))
    call_function(n, text)
  }
  def wordShingles(spark: SparkSession, text: Column, k: Int): Column = {
    val n = s"graft_word_shingles_$k"
    reg(spark, n, es => WordShinglesExpr(es.head, k))
    call_function(n, text)
  }
  def wordShinglesAll(spark: SparkSession, text: Column, k: Int): Column = {
    val n = s"graft_word_shingles_all_$k"
    reg(spark, n, es => WordShinglesAllExpr(es.head, k))
    call_function(n, text)
  }
  def winnowFingerprints(spark: SparkSession, text: Column, k: Int,
                         w: Int): Column = {
    val fast = graft.functions.Portable.fastHash
    val n = s"graft_winnow_fp_${k}_${w}_${if (fast) "xx" else "md5"}"
    reg(spark, n, es => WinnowFingerprintsExpr(es.head, k, w, fast))
    call_function(n, text)
  }
  def simhash64(spark: SparkSession, text: Column): Column = {
    val fast = graft.functions.Portable.fastHash
    val n = s"graft_simhash64_${if (fast) "xx" else "md5"}"
    reg(spark, n, es => SimHash64Expr(es.head, fast))
    call_function(n, text)
  }
  def arrayJaccard(spark: SparkSession, a: Column, b: Column): Column = {
    reg(spark, "graft_array_jaccard", es => ArrayJaccardExpr(es(0), es(1)))
    call_function("graft_array_jaccard", a, b)
  }
  def charNgrams(spark: SparkSession, text: Column, n: Int): Column = {
    val nm = s"graft_char_ngrams_$n"
    reg(spark, nm, es => CharNgramsExpr(es.head, n))
    call_function(nm, text)
  }
}
