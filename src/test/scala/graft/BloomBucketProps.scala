package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.ManifestTable

/** ScalaCheck laws for the other two plan-time skip authorities beside
  * the zone maps — both share the zone maps' failure asymmetry (a false
  * positive costs one extra file read; a false NEGATIVE silently drops
  * live rows from every query):
  *
  *   - string blooms: NO FALSE NEGATIVES ever (every added string tests
  *     positive, through the manifest-line render/parse round trip too);
  *   - the bucket hash: total, stable, in range, and sign-safe (the
  *     writer and the catalog's V2 function share this single
  *     definition — these laws are what "MUST agree forever" rests on).
  */
object BloomBucketProps extends Properties("BloomBucket") {

  private val str: Gen[String] = Gen.frequency(
    (6, Gen.alphaNumStr.map(_.take(24))),
    (1, Gen.const("")),
    (1, Gen.const("a\tb;c=d~e")),
    (1, Gen.const("中文😀é")))

  property("blooms have no false negatives") =
    forAll(Gen.listOf(str), str) { (added, probe) =>
      val bits = Array.fill(ManifestTable.DefaultBloomBits / 8)(0: Byte)
      (probe :: added).foreach(s => ManifestTable.bloomAdd(bits, s))
      (probe :: added).forall(s => ManifestTable.bloomMightContain(bits, s))
    }

  property("blooms survive the manifest-line render/parse round trip") =
    forAll(Gen.nonEmptyListOf(str)) { added =>
      val bits = Array.fill(ManifestTable.DefaultBloomBits / 8)(0: Byte)
      added.foreach(s => ManifestTable.bloomAdd(bits, s))
      val line = "data-x.parquet\t" + ManifestTable.bloomPiece("c", bits)
      val parsed = ManifestTable.parseBlooms(line)("c")
      added.forall(s => ManifestTable.bloomMightContain(parsed, s))
    }

  property("an empty bloom rejects everything (it can always skip)") =
    forAll(str) { probe =>
      val bits = Array.fill(ManifestTable.DefaultBloomBits / 8)(0: Byte)
      !ManifestTable.bloomMightContain(bits, probe)
    }

  property("bucketOf is total, in range, and matches for every long") =
    forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue),
      Gen.chooseNum(2, 1 << 12)) { (v, n) =>
      val b = ManifestTable.bucketOf(v, n)
      b >= 0 && b < n && b == ManifestTable.bucketOf(v, n)
    }

  property("bucketOf partitions congruent keys together and only together") =
    forAll(Gen.chooseNum(-100000L, 100000L), Gen.chooseNum(-100000L, 100000L),
      Gen.chooseNum(2, 64)) { (a, b, n) =>
      (ManifestTable.bucketOf(a, n) == ManifestTable.bucketOf(b, n)) ==
        (((a - b) % n) == 0)
    }
}
