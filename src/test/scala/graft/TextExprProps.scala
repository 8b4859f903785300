package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CdcChunksHelper, UnisegHelper}

/** ScalaCheck laws for the pure cores of the two round-10 text
  * expressions — randomized coverage the example-based specs can't give:
  * content-defined chunking must LOSSLESSLY partition any string and
  * re-synchronize after any prefix edit; Viterbi segmentation must be a
  * lossless partition under any model and never emit an out-of-model
  * multi-codepoint piece.
  */
object TextExprProps extends Properties("TextExprs") {

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (20, Gen.alphaNumChar.map(_.toString)),
        (5, Gen.const(" ")),
        (1, Gen.oneOf("é", "ü", "中", "😀")))).map(_.mkString))

  private def chunks(s: String): Seq[String] = {
    val arr = CdcChunksHelper.chunks(UTF8String.fromString(s), 8, 64)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("cdc chunks concatenate back to the input") =
    forAll(textGen) { s => chunks(s).mkString == s }

  property("cdc boundaries re-synchronize after any prefix edit") =
    forAll(textGen, Gen.alphaChar) { (s, c) =>
      // EVERY cut of the original survives a one-char prepend (the
      // window ending at old position p is the window ending at new
      // p+1), so all chunks after the first are reproduced verbatim —
      // exact suffix equality, not set overlap (a set comparison flakes
      // when the input happens to contain duplicate chunks)
      val a = chunks(s)
      val b = chunks(c.toString + s)
      a.size <= 1 || b.takeRight(a.size - 1) == a.drop(1)
    }

  private val modelGen: Gen[UnisegHelper.Model] =
    Gen.listOf(for {
      p <- Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
      s <- Gen.chooseNum(-20000000L, -1000L)
    } yield (p, s)).map { pieces =>
      val m = new java.util.HashMap[String, java.lang.Long]()
      pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
      new UnisegHelper.Model(m, 4)
    }

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaLowerChar.map(_.toString)),
      (1, Gen.const("😀")))).map(_.mkString))

  property("uniseg is a lossless partition under any model") =
    forAll(wordGen, modelGen) { (w, m) =>
      UnisegHelper.segment(w, m).mkString == w
    }

  property("uniseg never emits an out-of-model multi-codepoint piece") =
    forAll(wordGen, modelGen) { (w, m) =>
      UnisegHelper.segment(w, m).forall(p =>
        p.codePointCount(0, p.length) == 1 || m.scores.containsKey(p))
    }

  property("uniseg score is optimal vs brute force on short words") =
    forAll(wordGen.map(_.take(7)), modelGen) { (w, m) =>
      def score(p: String): Option[Long] = {
        val s = m.scores.get(p)
        if (s != null) Some(s.longValue)
        else if (p.codePointCount(0, p.length) == 1) Some(UnisegHelper.OovMicro)
        else None
      }
      def cps(s: String): Seq[String] = {
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < s.length) {
          val n = Character.charCount(s.codePointAt(i))
          out += s.substring(i, i + n); i += n
        }
        out.result()
      }
      def brute(parts: Seq[String]): Long =
        if (parts.isEmpty) 0L
        else (1 to math.min(4, parts.size)).flatMap { l =>
          score(parts.take(l).mkString)
            .map(_ + brute(parts.drop(l))).toSeq
        }.max
      val seg = UnisegHelper.segment(w, m)
      w.isEmpty || seg.map(p => score(p).get).sum == brute(cps(w))
    }
}
