package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** Additive schema evolution on the manifest table: a wider append
  * evolves the DDL (old rows null-pad the new trailing columns), a
  * narrower old-schema append still lands under the wide DDL, and any
  * non-prefix change (reorder, retype, mid-drop) is rejected loudly —
  * rows are token-positional, so the prefix rule IS the decodability
  * invariant.
  */
class ManifestEvolutionSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_manifest_evo").toString
    (1L to 10L).map(i => (i, s"row$i")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()
    dir
  }

  test("a wider append evolves the DDL; old rows null-pad the new column") {
    val dir = freshTable()
    Seq((11L, "row11", 111L), (12L, "row12", 122L)).toDF("id", "s", "v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val ddl = ManifestTable.currentManifest(dir).get._3
    assert(ddl.contains("v"), ddl)
    val rows = spark.read.format(Fmt).option("path", dir).load()
      .as[(Long, String, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(rows.size == 12)
    assert(rows.take(10).forall(_._3.isEmpty), "pre-evolution rows null-pad")
    assert(rows.find(_._1 == 11L).contains((11L, "row11", Some(111L))))
  }

  test("a narrower old-schema append lands and null-pads under the wide DDL") {
    val dir = freshTable()
    Seq((11L, "row11", 111L)).toDF("id", "s", "v")
      .write.format(Fmt).option("path", dir).mode("append").save() // evolve
    Seq((12L, "row12")).toDF("id", "s") // an old writer, pre-evolution schema
      .write.format(Fmt).option("path", dir).mode("append").save()
    val ddl = ManifestTable.currentManifest(dir).get._3
    assert(ddl.contains("v"), "the narrower append must not un-evolve the DDL")
    val r12 = spark.read.format(Fmt).option("path", dir).load()
      .filter($"id" === 12L).as[(Long, String, Option[Long])].collect().toSeq
    assert(r12 == Seq((12L, "row12", None)))
  }

  test("non-prefix appends are rejected: reorder, retype, rename") {
    val dir = freshTable()
    def fails(df: org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[Exception](
        df.write.format(Fmt).option("path", dir).mode("append").save())
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m => m != null && m.contains("additive")), e.getMessage)
    }
    fails(Seq(("rowX", 99L)).toDF("s", "id"))          // reordered
    fails(Seq((1L, 2L)).toDF("id", "s"))               // retyped s
    fails(Seq((1L, "x")).toDF("id", "renamed"))        // renamed
  }

  test("truncate replaces the schema outright; old wide versions still time-travel") {
    val dir = freshTable()
    Seq((11L, "row11", 111L)).toDF("id", "s", "v")
      .write.format(Fmt).option("path", dir).mode("append").save() // v2 wide
    Seq((1L, "only")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode("overwrite").save() // v3 narrow
    val ddl = ManifestTable.currentManifest(dir).get._3
    assert(!ddl.contains("v,") && !ddl.endsWith("v BIGINT"), ddl)
    val cur = spark.read.format(Fmt).option("path", dir).load().collect()
    assert(cur.length == 1)
    // the wide snapshot's rows remain readable (under the current narrow
    // read schema the extra trailing tokens are ignored)
    val v2 = spark.read.format(Fmt).option("path", dir)
      .option("version", "2").load().count()
    assert(v2 == 11L)
  }
}
