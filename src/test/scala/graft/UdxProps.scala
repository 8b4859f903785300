package graft

import java.math.{BigDecimal => JBigDecimal}

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.Udx

/** ScalaCheck laws for the pure cores of the UDx surface. The UDAF buffer
  * must be a commutative monoid under merge — that is exactly what makes
  * partial+final aggregation order-independent on a cluster, where merge
  * order is nondeterministic.
  */
object UdxProps extends Properties("Udx") {

  private val decGen: Gen[JBigDecimal] =
    Gen.chooseNum(-1000000L, 1000000L).map(n => new JBigDecimal(n).movePointLeft(2))

  private val pairGen: Gen[(JBigDecimal, JBigDecimal)] =
    for (p <- decGen; q <- decGen) yield (p, q)

  private val agg = Udx.WeightedAvg

  property("merge is commutative") = forAll(pairGen, pairGen) { (a, b) =>
    val x = agg.reduce(agg.zero, a)
    val y = agg.reduce(agg.zero, b)
    agg.merge(x, y) == agg.merge(y, x)
  }

  property("merge is associative") = forAll(pairGen, pairGen, pairGen) { (a, b, c) =>
    val (x, y, z) = (agg.reduce(agg.zero, a), agg.reduce(agg.zero, b), agg.reduce(agg.zero, c))
    agg.merge(agg.merge(x, y), z) == agg.merge(x, agg.merge(y, z))
  }

  property("zero is the merge identity") = forAll(pairGen) { a =>
    val x = agg.reduce(agg.zero, a)
    agg.merge(x, agg.zero) == x && agg.merge(agg.zero, x) == x
  }

  property("reduce == merge of singletons (split-anywhere safety)") =
    forAll(Gen.listOfN(6, pairGen)) { xs =>
      val sequential = xs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      sequential == merged
    }

  // --- slugify (pure string function behind the scalar UDF) -------------

  private def slug(s: String): String =
    s.replaceAll("[^a-zA-Z0-9]+", "-").toLowerCase(java.util.Locale.ROOT)

  private val strGen: Gen[String] = Gen.asciiPrintableStr

  property("slugify output alphabet is [a-z0-9-]") = forAll(strGen) { s =>
    slug(s).forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c == '-')
  }

  property("slugify is idempotent") = forAll(strGen) { s =>
    slug(slug(s)) == slug(s)
  }
}
