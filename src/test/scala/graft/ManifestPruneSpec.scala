package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** Column pruning on the manifest scan
  * (`SupportsPushDownRequiredColumns`): a narrow projection parses and
  * emits only its own tokens. Pins: the scan's ReadSchema really shrinks,
  * values survive the narrow decode, merge-on-read delete filtering still
  * applies when the KEY column is pruned OUT of the projection (the
  * reader probes key tokens outside the projection), and the streaming
  * source prunes too.
  */
class ManifestPruneSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def store(): String = {
    val dir = Files.createTempDirectory("graft_manifest_prune").toString
    spark.range(0, 1000)
      .select(col("id").as("k"), concat(lit("n"), col("id")).as("name"),
        (col("id") * 7).as("v"), (col("id") % 2 === 0).as("flag"))
      .coalesce(2)
      .write.format(Fmt).option("path", dir).mode("append").save()
    dir
  }

  private def readFields(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan.readSchema().fieldNames.toSeq
    }.head

  test("a narrow projection prunes the scan's ReadSchema; values exact") {
    val dir = store()
    val t = spark.read.format(Fmt).option("path", dir).load()
    val narrow = t.select("v")
    assert(readFields(narrow) == Seq("v"),
      s"expected a 1-column ReadSchema, got ${readFields(narrow)}")
    assert(narrow.as[Long].collect().sum == (0L until 1000L).map(_ * 7).sum)
    // mixed projection prunes to the two fields (scan keeps TABLE order;
    // the Project above restores the requested order)
    val two = t.select("flag", "k")
    assert(readFields(two).sorted == Seq("flag", "k"),
      s"got ${readFields(two)}")
    assert(two.filter(col("flag")).count() == 500L)
  }

  test("delete filtering survives pruning the key column out of the projection") {
    val dir = store()
    ManifestTable.deleteKeys(dir, "k", (0L until 100L).toSeq)
    val t = spark.read.format(Fmt).option("path", dir).load()
    val vOnly = t.select("v")
    assert(readFields(vOnly) == Seq("v"))
    // the 100 deleted rows' v values must be gone even though k was
    // never projected
    assert(vOnly.as[Long].collect().sum == (100L until 1000L).map(_ * 7).sum)
    assert(vOnly.count() == 900L)
  }

  test("the streaming source decodes through the pruned schema") {
    val dir = store()
    import org.apache.spark.sql.streaming.Trigger
    val name = "prune_stream_sink"
    val q = spark.readStream.format(Fmt).option("path", dir).load()
      .select("name", "v")
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name)
    assert(rows.count() == 1000L)
    assert(rows.filter(col("name") === "n7").select("v").as[Long].head() == 49L)
  }
}
