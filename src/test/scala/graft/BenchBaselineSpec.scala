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

  test("Bench's embedded drive baselines track BASELINE.md's drive table") {
    val txt = {
      val src = scala.io.Source.fromFile("BASELINE.md", "UTF-8")
      try src.mkString finally src.close()
    }
    // the drive table is the TWO-column one (name | seconds); the
    // survey table has four columns and never matches this shape
    val re = """(?m)^\| (\w+) \| ([\d.]+) \|$""".r
    val fromMd = re.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(fromMd.nonEmpty, "BASELINE.md drive table missing or misparsed")
    val missing = fromMd.keySet -- Bench.driveBaseline.keySet
    val extra = Bench.driveBaseline.keySet -- fromMd.keySet
    assert(missing.isEmpty && extra.isEmpty,
      s"drive baseline key drift — missing: $missing, extra: $extra")
    val diff = fromMd.collect {
      case (k, v) if math.abs(Bench.driveBaseline(k) - v) > 1e-9 =>
        s"$k: md=$v embedded=${Bench.driveBaseline(k)}"
    }
    assert(diff.isEmpty, s"drive baseline value drift — ${diff.mkString("; ")}")
    // every baselined drive must still be a registered query
    assert((Bench.driveBaseline.keySet -- Registry.all.keySet).isEmpty)
  }

  test("rescue pass: arms past 1.5x, keeps the min, reports pre/post, honors failures") {
    val base = Map("hot" -> 1.0, "fine" -> 0.2, "failed" -> -1.0)
    val baselines = Map("hot" -> 0.4, "fine" -> 0.2)
    // deliberately-loaded-host simulation: first resample still inflated,
    // second lands under the 1.5x bar (0.6 s) -> early exit after 2
    val samples = Iterator(0.9, 0.5, 0.45)
    val (out, rescued) = Bench.rescuePass(
      base, baselines, armed = true, budgetNs = Long.MaxValue / 4)(_ => samples.next())
    assert(out("hot") == 0.5)
    assert(rescued("hot") == ((1.0, 0.5, 2)), s"got ${rescued("hot")}")
    // at-baseline and failed queries are untouched (a -1 sentinel must
    // never be "rescued" into looking like a timing)
    assert(out("fine") == 0.2 && out("failed") == -1.0)
    assert(!rescued.contains("fine") && !rescued.contains("failed"))
    // unarmed (non-sf0.1): the timer must never be invoked
    val (out2, rescued2) = Bench.rescuePass(
      base, baselines, armed = false, budgetNs = Long.MaxValue / 4)(
      _ => throw new AssertionError("rescue ran while disarmed"))
    assert(out2 == base && rescued2.isEmpty)
    // a rerun that throws (timer returns -1) contributes NO timing: the
    // pre-rescue value stands after all samples burn
    val (out3, rescued3) = Bench.rescuePass(
      Map("hot" -> 1.0), baselines, armed = true, budgetNs = Long.MaxValue / 4)(_ => -1.0)
    assert(out3("hot") == 1.0 && rescued3("hot") == ((1.0, 1.0, 4)))
  }
}
