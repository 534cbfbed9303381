package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.types._

/** Property tests (SURVEY §5.3): dtype round-trips, promotion algebra,
  * duration parsing, drift non-negativity on arbitrary histograms.
  * (scalatestplus bridge is not on the offline classpath, so properties
  * sample generators directly.) */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val primitives =
    Gen.oneOf("int64", "float32", "float64", "bool", "string", "bytes", "timestamp")

  private val dtypeGen: Gen[String] = Gen.oneOf(
    primitives,
    Gen.choose(1, 4096).map(n => s"string[$n]"),
    for {
      dt <- Gen.oneOf("float16", "float32", "float64")
      d <- Gen.choose(1, 4096)
    } yield s"$dt[$d]",
    primitives.map(p => s"$p[]"),
    Gen.zip(primitives, Gen.choose(1, 100)).map { case (p, n) => s"$p[:$n]" })

  test("property: parse(typeString(parse(s))) == parse(s)") {
    forAll(dtypeGen) { s =>
      val t = FeatureType.parse(s)
      assert(FeatureType.parse(t.typeString) == t)
    }
  }

  test("property: isCompatible is reflexive; numeric promotion is monotone") {
    forAll(dtypeGen) { s =>
      val t = FeatureType.parse(s)
      assert(t.isCompatible(t))
    }
    val nums = Seq(TInt64, TFloat32, TFloat64)
    for (a <- nums; b <- nums; op <- Seq("+", "-", "*")) {
      val r = FeatureType.inferResultType(a, op, b)
      // result accepts both operands (promotion is an upper bound)
      assert(r.isCompatible(a) && r.isCompatible(b), s"$a $op $b -> $r")
    }
  }

  test("property: duration parse consistent between interval and seconds") {
    import graft.analysis.AnalysisPlanner
    forAll(Gen.choose(1L, 10000L), Gen.oneOf("s", "m", "h", "d", "w")) {
      (n, u) =>
        val secs = AnalysisPlanner.durationToIntervalSeconds(s"$n$u")
        val perUnit = Map("s" -> 1L, "m" -> 60L, "h" -> 3600L,
          "d" -> 86400L, "w" -> 604800L)(u)
        assert(secs == n * perUnit)
    }
  }

  test("property: PSI and KL are non-negative, zero iff identical histograms") {
    val histGen = Gen.listOfN(10, Gen.choose(1, 1000))
    forAll(histGen, histGen) { (ha, hb) =>
      def props(h: Seq[Int]): Seq[Double] = {
        val t = h.sum.toDouble
        h.map(x => math.max(x / t, 1e-9))
      }
      val (p, q) = (props(ha), props(hb))
      val psi = p.zip(q).map { case (a, b) => (a - b) * math.log(a / b) }.sum
      val kl = p.zip(q).map { case (a, b) => a * math.log(a / b) }.sum
      assert(psi >= -1e-12)
      assert(kl >= -1e-12) // Gibbs' inequality
      if (ha == hb) assert(math.abs(psi) < 1e-12 && math.abs(kl) < 1e-12)
    }
  }

  test("property: FeatureRef round-trips through qualified form parts") {
    val ident = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
    forAll(ident, ident, Gen.option(Gen.choose(1, 99))) { (g, f, v) =>
      whenever(g.nonEmpty && f.nonEmpty) {
        val s = s"$g.$f" + v.fold("")(n => s"@v$n")
        val r = graft.expr.FeatureRef.parse(s)
        assert(r.group.contains(g) && r.feature == f && r.version == v)
      }
    }
  }
}
