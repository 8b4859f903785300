package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The config-time extension path (`spark.sql.extensions=
  * graft.GraftExtensions`) must give SQL users the graft_* functions and
  * the as-of planner strategy with no programmatic registration.
  */
class ExtensionsSpec extends AnyFunSuite with SparkSessionFixture {

  test("GraftExtensions injects functions and the as-of strategy") {
    val base = spark // force the shared session (and its context) up first
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      // spark.sql.extensions is a STATIC conf — it can't take effect on a
      // shared test SparkContext — so reproduce the config path's
      // reflection contract explicitly: instantiate by NAME with a
      // zero-arg constructor and the Function1[SparkSessionExtensions,
      // Unit] shape, exactly what spark-submit's conf handling requires.
      val byName = Class.forName("graft.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(byName)
        .getOrCreate()
      assert(s2 ne base, "extensions require a freshly-built session")
      // Functions available from pure SQL:
      val r = s2.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       graft_jaccard(array('a'), array('a', 'b')) AS j""".stripMargin).head
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 0.5)
      // Planner strategy available without AsOf.asofJoin's runtime
      // registration: build the logical node directly.
      val t = Tables(s2, "/root/testdata/sf0.001")
      val p = t.events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val s = t.events.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      val lPlan = p.queryExecution.analyzed
      val rPlan = s.queryExecution.analyzed
      val node = graft.plans.AsOfJoinPlan(
        lPlan, rPlan,
        Seq(lPlan.output.find(_.name == "user_id").get),
        Seq(rPlan.output.find(_.name == "s_user").get),
        lPlan.output.find(_.name == "ts").get,
        rPlan.output.find(_.name == "s_ts").get,
        None)
      val n = org.apache.spark.sql.GraftPlanBridge.ofRows(s2, node).count()
      assert(n > 0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
