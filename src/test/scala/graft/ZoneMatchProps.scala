package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.sources._

import graft.sources.ManifestTable

/** ScalaCheck laws for the zone-map matcher — the ONE function whose
  * false negative is silent data loss at plan time (a skipped file's
  * rows simply vanish from every query), shared by the scan, DPP, and
  * the COW delete's candidate selection. Checked against a brute-force
  * enumeration of the file's value range:
  *
  *   - SOUNDNESS (critical): if ANY value in [lo, hi] satisfies the
  *     predicate, the matcher must keep the file;
  *   - TIGHTNESS (for the exactly-translatable integral shapes): if NO
  *     value in [lo, hi] satisfies it, the matcher must skip — a
  *     matcher that never skips would be "sound" and useless;
  *   - date-valued predicates are sound against epoch-day ranges
  *     (the round-14 zone-map extension).
  */
object ZoneMatchProps extends Properties("ZoneMatch") {

  private val rangeGen: Gen[(Long, Long)] = for {
    lo <- Gen.chooseNum(-300L, 300L)
    w <- Gen.chooseNum(0L, 120L)
  } yield (lo, lo + w)

  private val valueGen: Gen[Long] = Gen.chooseNum(-350L, 350L)

  private def mk(op: Int, v: Any): Filter = op match {
    case 0 => EqualTo("c", v)
    case 1 => GreaterThan("c", v)
    case 2 => GreaterThanOrEqual("c", v)
    case 3 => LessThan("c", v)
    case 4 => LessThanOrEqual("c", v)
    case _ => In("c", Array(v))
  }

  private def sat(op: Int, x: Long, v: Long): Boolean = op match {
    case 0 | 5 => x == v
    case 1 => x > v
    case 2 => x >= v
    case 3 => x < v
    case 4 => x <= v
  }

  private def mayMatch(lo: Long, hi: Long, f: Filter): Boolean =
    ManifestTable.mayMatchZone(Map("c" -> (lo, hi)), f)

  property("soundness + tightness for long-valued predicates") =
    forAll(rangeGen, valueGen, Gen.chooseNum(0, 5)) { case ((lo, hi), v, op) =>
      val exists = (lo to hi).exists(x => sat(op, x, v))
      mayMatch(lo, hi, mk(op, java.lang.Long.valueOf(v))) == exists
    }

  property("soundness + tightness for int-valued predicates") =
    forAll(rangeGen, valueGen, Gen.chooseNum(0, 5)) { case ((lo, hi), v, op) =>
      val exists = (lo to hi).exists(x => sat(op, x, v))
      mayMatch(lo, hi,
        mk(op, java.lang.Integer.valueOf(v.toInt))) == exists
    }

  property("date-valued predicates are exact against epoch-day zone maps") =
    forAll(rangeGen, valueGen, Gen.chooseNum(0, 5)) { case ((lo, hi), v, op) =>
      val exists = (lo to hi).exists(x => sat(op, x, v))
      val date = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v))
      mayMatch(lo, hi, mk(op, date)) == exists
    }

  property("multi-value IN keeps the file iff any listed value lands in range") =
    forAll(rangeGen, Gen.nonEmptyListOf(valueGen)) { case ((lo, hi), vs) =>
      val exists = vs.exists(v => v >= lo && v <= hi)
      mayMatch(lo, hi,
        In("c", vs.map(v => java.lang.Long.valueOf(v): Any).toArray)) == exists
    }

  property("untranslatable values never skip (conservative)") =
    forAll(rangeGen, Gen.chooseNum(0, 5)) { case ((lo, hi), op) =>
      // a value type the zone maps don't speak must keep the file
      mayMatch(lo, hi, mk(op, new java.math.BigDecimal("1.25")))
    }

  property("a column with no recorded stats never skips") =
    forAll(valueGen, Gen.chooseNum(0, 5)) { (v, op) =>
      ManifestTable.mayMatchZone(Map.empty, mk(op, java.lang.Long.valueOf(v)))
    }
}
