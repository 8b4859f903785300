package graft

import org.scalatest.funsuite.AnyFunSuite

/** The rescue pass keys off per-query baselines EMBEDDED in Bench.scala
  * (the bench cannot read markdown at runtime); BASELINE.md's table is
  * the committed source of truth. This pin makes drift between the two
  * a test failure instead of a silently mis-armed rescue pass.
  */
class BenchBaselineSpec extends AnyFunSuite {

  test("Bench's embedded rescue baselines track BASELINE.md's per-query table") {
    val txt = {
      val src = scala.io.Source.fromFile("BASELINE.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val re = """\| (\w+) \| [\d.]+ \| ([\d.]+) \| \d+ \|""".r
    val fromMd = re.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(fromMd.size == 69, s"BASELINE.md table parse drifted: ${fromMd.size} rows")
    val missing = fromMd.keySet -- Bench.surveyBaseline.keySet
    val extra = Bench.surveyBaseline.keySet -- fromMd.keySet
    assert(missing.isEmpty && extra.isEmpty,
      s"baseline key drift — missing: $missing, extra: $extra")
    val diff = fromMd.collect {
      case (k, v) if math.abs(Bench.surveyBaseline(k) - v) > 1e-9 =>
        s"$k: md=$v embedded=${Bench.surveyBaseline(k)}"
    }
    assert(diff.isEmpty, s"baseline value drift — ${diff.mkString("; ")}")
  }
}
