package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Partitioned

/** Date-partitioned layout: time-bounded reads must prune partitions at
  * plan time and agree with the unpartitioned filter.
  */
class PartitionedSpec extends AnyFunSuite with SparkSessionFixture {

  test("date filter prunes partitions and results match the full scan") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-part").toString
    Partitioned.writeDatePartitioned(t.events, s"$dir/events", "ts")

    val nDays = new java.io.File(s"$dir/events").listFiles()
      .count(_.getName.startsWith("p_date="))
    assert(nDays > 5, s"expected multiple day partitions, got $nDays")

    val bounded = Partitioned.read(spark, s"$dir/events")
      .filter(col("p_date") === "2024-01-05")
    bounded.collect()
    val plan = bounded.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    assert(!plan.contains("PartitionFilters: []"), plan)

    val want = t.events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(bounded.count() == want && want > 0)
  }
}
