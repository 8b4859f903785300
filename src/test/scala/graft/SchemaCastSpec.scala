package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SchemaCast

/** Declared-schema cast levels: loader validation, non-vacuous violation
  * classes on synthetic data (incl. the uniqueness path the real events
  * table can't exercise — its unique_on is genuinely unique), and the
  * loose/strict consistency laws.
  */
class SchemaCastSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  test("malformed schema specs are rejected by class") {
    def err(yaml: String): String =
      intercept[IllegalArgumentException](SchemaCast.fromYaml(yaml)).getMessage
    assert(err("name: s\nfields: [{name: a, type: Wat}]").contains("unknown field type"))
    assert(err("""name: s
                 |fields:
                 |  - {name: a, type: Text}
                 |  - {name: a, type: Text}""".stripMargin).contains("duplicate"))
    assert(err("""name: s
                 |unique_on: [zzz]
                 |fields: [{name: a, type: Text}]""".stripMargin)
      .contains("unique_on field 'zzz'"))
    assert(err("""name: s
                 |fields: [{name: a, type: "Decimal(40,2)"}]""".stripMargin)
      .contains("decimal"))
    assert(err("name: s").contains("fields"))
  }

  test("the event schema loads with the declared shape") {
    val s = SchemaCast.fromResource("/schemas/event.yml")
    assert(s.name == "event" && s.uniqueOn == Seq("event_id"))
    assert(s.fields.map(_.name) ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(s.fields.find(_.name == "event_type").get.domain ==
      Seq("click", "view", "purchase", "signup"))
  }

  test("every violation class fires on a synthetic block, incl. unique_on dups") {
    import spark.implicits._
    val spec = SchemaCast.fromYaml(
      """name: t
        |unique_on: [k]
        |fields:
        |  - {name: k, type: Integer, nullable: false}
        |  - {name: v, type: "Decimal(3,1)", nullable: false}
        |  - {name: s, type: Text, domain: [a, b]}""".stripMargin)
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 1.5, "a"),       // clean
      (1L, 2.5, "b"),       // dup of k=1
      (null, 3.5, "a"),     // null k (non-nullable; NOT a dup)
      (null, 3.5, "a"),     // second null k — still not a dup of the first
      (4L, 99.9, "c"),      // domain violation only (99.9 fits Decimal(3,1))
      (5L, 1000.0, "a"),    // decimal overflow
      (6L, null, "b"))      // null v (non-nullable)
      .toDF("k", "v", "s")
    val rep = SchemaCast.enforce(df, spec)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("rows:total") == 7L)
    // both copies of k=1 are flagged; NULL keys violate nullability, not
    // uniqueness (SQL semantics — the oracle's IN-subquery agrees)
    assert(rep("dup:k") == 2L)
    assert(rep("null:k") == 2L && rep("null:v") == 1L)
    assert(rep("cast:v") == 1L)       // 1000.0 overflows Decimal(3,1)
    assert(rep("domain:s") == 1L)
    assert(rep("rows:quarantined") == 7L && rep("rows:clean") == 0L)
    // the loose report sees the same per-field counts, data still flows
    val loose = SchemaCast.castReport(df, spec)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(loose("k") == ((2L, 0L, 0L)))
    assert(loose("v") == ((1L, 1L, 0L)))
    assert(loose("s") == ((0L, 0L, 1L)))
  }

  test("strict gate laws on the real corpus: clean + quarantined = total, OR semantics") {
    val t = Tables(spark, sf)
    val rep = SchemaCast.schemaEnforce(t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("rows:clean") + rep("rows:quarantined") == rep("rows:total"))
    val reasonSum = rep.filterNot(_._1.startsWith("rows:")).values.sum
    // overlapping reasons may double-count flags but never rows
    assert(rep("rows:quarantined") <= reasonSum)
    // recompute quarantine independently with a plain filter
    val expected = t.events.filter(
      col("value").isNull || col("ts").isNull || col("user_id").isNull ||
        col("event_id").isNull || col("event_type").isNull ||
        expr("try_cast(value AS DECIMAL(4,2))").isNull && col("value").isNotNull ||
        !col("event_type").isin("click", "view", "purchase", "signup") &&
          col("event_type").isNotNull).count()
    assert(rep("rows:quarantined") == expected)
  }
}
