package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LogReg

/** Logistic-regression trainer: the integer-quantized gradient discipline
  * must make the trajectory exactly reproducible (across runs AND across
  * partitionings), and plain GD on a convex loss must descend.
  */
class LogRegSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  test("trajectory is deterministic and loss descends monotonically") {
    val t = Tables(spark, sf)
    val a = LogReg.mlLogreg(t).collect()
    val b = LogReg.mlLogreg(t).collect()
    assert(a.length == LogReg.Iters + 1)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "non-deterministic rerun")
    val losses = a.sortBy(_.getAs[Int]("iter")).map(_.getAs[Long]("loss_micro"))
    assert(losses.head == 693147, s"iter-0 loss must be ln 2 in micro-nats, got ${losses.head}")
    losses.sliding(2).foreach { case Array(prev, next) =>
      assert(next < prev, s"loss did not descend: $prev -> $next")
    }
  }

  test("weights are invariant to input partitioning") {
    val t = Tables(spark, sf)
    val base = LogReg.mlLogreg(t).collect().map(_.toSeq).toSeq
    // same data shuffled into a different layout: the integer gradient
    // sums are associative, so the trajectory must be bit-identical
    val dir = java.nio.file.Files.createTempDirectory("graft-logreg").toString
    t.documents.repartition(7).write.parquet(s"$dir/documents.parquet")
    val again = LogReg.mlLogreg(Tables(spark, dir)).collect().map(_.toSeq).toSeq
    assert(base == again, "trajectory depends on partitioning")
  }
}
