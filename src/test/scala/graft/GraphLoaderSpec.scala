package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.GraphLoader

/** Declarative graph loader: the JSON-built pipeline must equal the
  * code-level graph row for row, and every malformed-spec class must be
  * rejected at LOAD time with a named error.
  */
class GraphLoaderSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  test("loader-built pipeline == code-level pipeline") {
    val spec = GraphLoader.fromResource("/graphs/revenue_by_segment.json")
    val got = GraphLoader.produce(spec, spark, sf)
      .collect().map(_.toString).toSeq
    val want = ops.Pipelines.pipelineRevenueBySegment(Tables(spark, sf))
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("params substitute into SQL and unresolved params are rejected") {
    val spec = GraphLoader.fromResource("/graphs/revenue_by_segment.json")
    assert(spec.nodes.find(_.name == "big_orders").get.sql.contains("150000.0"))
    val bad = """{"name":"g","target":"a","nodes":[
      {"name":"src","kind":"source","table":"orders"},
      {"name":"a","kind":"sql","deps":["src"],"sql":"SELECT ${nope} FROM src"}]}"""
    val e = intercept[IllegalArgumentException](GraphLoader.fromJson(bad))
    assert(e.getMessage.contains("unresolved param"))
  }

  test("malformed specs are rejected by class") {
    def err(json: String): String =
      intercept[IllegalArgumentException](GraphLoader.fromJson(json)).getMessage
    assert(err("""not json""").contains("unparseable"))
    assert(err("""{"name":"g","target":"t"}""").contains("nodes"))
    assert(err("""{"name":"g","target":"t","nodes":[
      {"name":"a","kind":"wat"}]}""").contains("unknown kind"))
    assert(err("""{"name":"g","target":"a","nodes":[
      {"name":"a","kind":"source","table":"no_such_table"}]}""")
      .contains("unknown source table"))
    assert(err("""{"name":"g","target":"b","nodes":[
      {"name":"a","kind":"source","table":"orders"},
      {"name":"b","kind":"sql","deps":["zzz"],"sql":"SELECT 1"}]}""")
      .contains("unknown dep"))
    assert(err("""{"name":"g","target":"a","nodes":[
      {"name":"a","kind":"source","table":"orders"},
      {"name":"a","kind":"source","table":"orders"}]}""").contains("duplicate"))
    assert(err("""{"name":"g","target":"a","nodes":[
      {"name":"a","kind":"sql","deps":["b"],"sql":"SELECT 1"},
      {"name":"b","kind":"sql","deps":["a"],"sql":"SELECT 1"}]}""")
      .contains("cycle"))
    assert(err("""{"name":"g","target":"zzz","nodes":[
      {"name":"a","kind":"source","table":"orders"}]}""")
      .contains("unknown target"))
    assert(err("""{"name":"g","target":"a b","nodes":[
      {"name":"a b","kind":"source","table":"orders"}]}""")
      .contains("plain identifier"))
  }

  test("the YAML front-end parses to the identical spec as the JSON one") {
    val y = GraphLoader.fromResource("/graphs/revenue_by_segment.yml")
    val j = GraphLoader.fromResource("/graphs/revenue_by_segment.json")
    assert(y == j)
    val e = intercept[IllegalArgumentException](
      GraphLoader.fromYaml("nodes: [\n  - {name: ["))
    assert(e.getMessage.contains("unparseable YAML"))
  }

  test("query nodes expose registered operators to the graph") {
    val spec = GraphLoader.fromJson("""{"name":"g3","target":"top","nodes":[
      {"name":"q1","kind":"query","query":"agg_hash_q1"},
      {"name":"top","kind":"sql","deps":["q1"],
       "sql":"SELECT l_returnflag, l_linestatus FROM q1 ORDER BY 1, 2"}]}""")
    val got = GraphLoader.produce(spec, spark, sf)
      .collect().map(_.toString).toSeq
    val want = Registry.all("agg_hash_q1")(spark, sf)
      .select("l_returnflag", "l_linestatus")
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
    val e = intercept[IllegalArgumentException](
      GraphLoader.fromJson("""{"name":"g","target":"a","nodes":[
        {"name":"a","kind":"query","query":"zzz_nope"}]}"""))
    assert(e.getMessage.contains("unknown registry query"))
  }

  test("an undeclared table reference in a sql node fails analysis") {
    // 'customer' exists in the engine but is NOT a declared dep of the
    // node — the private produce session must leave it unresolvable
    val spec = GraphLoader.fromJson("""{"name":"g2","target":"a","nodes":[
      {"name":"src","kind":"source","table":"orders"},
      {"name":"a","kind":"sql","deps":["src"],
       "sql":"SELECT * FROM src JOIN customer ON o_custkey = c_custkey"}]}""")
    intercept[org.apache.spark.sql.AnalysisException] {
      GraphLoader.produce(spec, spark, sf).collect()
    }
  }
}
