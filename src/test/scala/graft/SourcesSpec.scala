package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** CSV / JSON-lines round-trips with declared schemas (no testdata files
  * exist for these formats — survey marks them unit-test-only).
  */
class SourcesSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val nation = Tables(spark, "/root/testdata/sf0.001").nation

  test("csv source round-trips with declared schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    nation.write.option("header", "true").csv(s"$dir/nation_csv")
    val back = Sources.csvSource(spark, s"$dir/nation_csv", nation.schema)
    assert(back.schema == nation.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      nation.collect().map(_.toString).sorted.toSeq)
  }

  test("json-lines source round-trips with declared schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    nation.write.json(s"$dir/nation_json")
    val back = Sources.jsonLinesSource(spark, s"$dir/nation_json", nation.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      nation.collect().map(_.toString).sorted.toSeq)
  }

  test("orc block round-trips and pushes filters into the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val lineitem = Tables(spark, "/root/testdata/sf0.001").lineitem
    Sources.writeOrcBlock(lineitem, s"$dir/li_orc")
    val back = Sources.orcSource(spark, s"$dir/li_orc", lineitem.schema)
    assert(back.count() == lineitem.count())
    val filtered = back
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 49.0)
      .select("l_orderkey", "l_quantity")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_quantity"),
      s"expected filter pushdown into ORC scan, got: $scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_comment"))
    assert(filtered.count() ==
      lineitem.filter(org.apache.spark.sql.functions.col("l_quantity") > 49.0).count())
  }

  test("block writer refuses to overwrite an existing block") {
    val dir = Files.createTempDirectory("graft-block").toString
    Sources.writeBlock(nation, s"$dir/b1")
    assert(spark.read.parquet(s"$dir/b1").count() == 25)
    intercept[Exception] {
      Sources.writeBlock(nation, s"$dir/b1")
    }
  }
}
