package graft

import graft.functions.Geom
import graft.operators.Raster
import graft.plans.TextHashUtil
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.3) — pure JVM, no SparkSession:
  * the union aggregate's algebraic laws, the minhash lattice property, the
  * filename-parser roundtrip, and routing/n-gram shape guarantees.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  private val cellGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0, 7), Gen.choose(0, 7)))

  test("union of grid cells: area == distinct cells × cellsize², any input order") {
    check(Prop.forAll(cellGen, Gen.choose(0L, Long.MaxValue)) { (cells, seed) =>
      cells.nonEmpty ==> {
        val cs = 0.25
        val wkbs = cells.map { case (r, c) => Geom.cellRectWkb(r, c, 0.0, 0.0, cs, 8) }
        val agg = Geom.UnionAgg
        def areaOf(ws: Seq[Array[Byte]]): Double =
          Geom.area(agg.finish(ws.foldLeft(agg.zero)(agg.reduce)))
        val expected = cells.distinct.size * cs * cs
        val shuffled = new scala.util.Random(seed).shuffle(wkbs)
        areaOf(wkbs) == expected && areaOf(shuffled) == expected
      }
    })
  }

  test("union WKB bytes are GROUPING-invariant (canonical form), not just area") {
    // the r6 q_geo_union_wkb fingerprint oracle depends on this exactly:
    // however the cells are split across partial buffers and merged, the
    // finished WKB must be byte-identical (finish() normalizes)
    check(Prop.forAll(cellGen, Gen.choose(1, 11), Gen.choose(0L, Long.MaxValue)) {
      (cells, cut0, seed) =>
      cells.nonEmpty ==> {
        val wkbs = cells.map { case (r, c) => Geom.cellRectWkb(r, c, 0.0, 0.0, 0.25, 8) }
        val agg = Geom.UnionAgg
        def run(ws: Seq[Array[Byte]]): Seq[Array[Byte]] =
          ws.foldLeft(agg.zero)(agg.reduce)
        val oneShot = agg.finish(run(wkbs))
        val cut = cut0 % wkbs.length
        val (l, r) = new scala.util.Random(seed).shuffle(wkbs).splitAt(math.max(cut, 1))
        val merged = agg.finish(agg.merge(run(l), run(r)))
        java.util.Arrays.equals(oneShot, merged)
      }
    })
  }

  test("union aggregate merge is associative/commutative at the area level") {
    check(Prop.forAll(cellGen, cellGen) { (as, bs) =>
      (as.nonEmpty && bs.nonEmpty) ==> {
        val cs = 0.5
        def buf(cells: List[(Int, Int)]) = cells
          .map { case (r, c) => Geom.cellRectWkb(r, c, 0.0, 0.0, cs, 8) }
          .foldLeft(Geom.UnionAgg.zero)(Geom.UnionAgg.reduce)
        val ab = Geom.area(Geom.UnionAgg.finish(Geom.UnionAgg.merge(buf(as), buf(bs))))
        val ba = Geom.area(Geom.UnionAgg.finish(Geom.UnionAgg.merge(buf(bs), buf(as))))
        ab == ba && ab == (as ++ bs).distinct.size * cs * cs
      }
    })
  }

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)

  test("minhash lattice: sig(A ∪ B) == elementwise min(sig(A), sig(B)) for k=1") {
    // with unigram shingles, the shingle set of "a b" ++ " " ++ "c d" IS
    // the union of the two token sets — the defining MinHash property
    check(Prop.forAll(Gen.nonEmptyListOf(word), Gen.nonEmptyListOf(word)) { (a, b) =>
      def sig(s: String) = {
        val arr = TextHashUtil.minhashSig(UTF8String.fromString(s), 1, 6)
        (0 until 6).map(arr.getLong)
      }
      val sa = sig(a.mkString(" "))
      val sb = sig(b.mkString(" "))
      val su = sig((a ++ b).mkString(" "))
      su == sa.zip(sb).map { case (x, y) => math.min(x, y) }
    })
  }

  test("filename parse roundtrip for both reference branches (etl.py:188-198)") {
    val tok = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
    check(Prop.forAll(Gen.oneOf("25", "50", "75"), tok, tok,
      Gen.choose(2000, 2100)) { (t, src, scen, year) =>
      val full = Raster.parseRasterFilenameScala(s"${t}_${src}_${scen}_y$year.shp")
      val cur = Raster.parseRasterFilenameScala(s"${t}_current.shp")
      full == ((t, src, scen, year.toString)) &&
        cur == ((t, "vtech", "current", "2020"))
    })
  }

  test("char n-grams: every gram has exactly n code points; short inputs empty") {
    check(Prop.forAll(Gen.alphaStr, Gen.choose(1, 5)) { (s, n) =>
      val arr = TextHashUtil.charNgrams(UTF8String.fromString(s), n)
      val grams = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      if (s.length < n) grams.isEmpty
      else grams.forall(g => g.codePointCount(0, g.length) == n) &&
        grams.toSet.size == grams.size // distinct by construction
    })
  }
}
