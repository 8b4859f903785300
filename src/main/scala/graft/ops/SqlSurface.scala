package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame

/** Spark-4 SQL-surface queries: the PARSER features a SQL user reaches
  * for before ever touching the DataFrame API — pipe syntax, session
  * variables, multi-statement scripting. Each compiles down to the same
  * Catalyst plans the DataFrame twins build (the features are sugar over
  * analysis, not new executors), so the queries exist to pin that the
  * surfaces parse/plan/run and that their semantics match a plain-SQL
  * oracle — not to add operator semantics of their own.
  */
object SqlSurface {

  /** SQL PIPE syntax (Spark 4.0+ `|>` operators): the Q1-shaped rollup
    * written as a linear pipeline — source, filter, computed column
    * (`EXTEND`), aggregate, order — the form that keeps multi-stage SQL
    * readable in review. `sum(l_quantity)` is a double sum of INTEGRAL
    * quantities (exact below 2^53 in any order); price is exact cents.
    * The plan is identical to the plain GROUP BY: one partial+final
    * aggregate, filter pushed to the scan.
    */
  def sqlPipeSyntax(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """FROM lineitem
        ||> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        ||> EXTEND CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        ||> AGGREGATE count(*) AS cnt, sum(price_c) AS sum_cents,
        |             CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** SQL session variables (Spark 4.0+ `DECLARE VARIABLE` / `SET VAR`):
    * the parameterized-query discipline without string interpolation —
    * thresholds live in typed session state and resolve at ANALYSIS
    * time (a later `SET VAR` cannot mutate an already-built plan, so
    * the returned frame is stable under Bench re-runs). `DECLARE OR
    * REPLACE` keeps repeated invocations in one long-lived session
    * idempotent; the variable names are prefixed to this query so no
    * concurrent session state can collide.
    */
  def sqlSessionVars(t: Tables): DataFrame = {
    t.registerViews()
    val s = t.spark
    s.sql("DECLARE OR REPLACE VARIABLE graft_vars_price_floor BIGINT DEFAULT 0")
    s.sql("SET VAR graft_vars_price_floor = 1500 * 100 * 100")
    s.sql("DECLARE OR REPLACE VARIABLE graft_vars_skip_status STRING DEFAULT 'P'")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n,
        |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
        |FROM orders
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) > graft_vars_price_floor
        |  AND o_orderstatus <> graft_vars_skip_status
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** SQL scripting (Spark 4.0+ `BEGIN … END` control flow): a WHILE
    * loop computes the price cap (1 → 3^11 = 177147 — the first power
    * of 3 past 100000; the ORACLE restates that literal, coupled by
    * this comment on both sides), then the final SELECT is the script's
    * result. Script variables are script-scoped, so repeated
    * invocations in one session can't collide; the loop runs on the
    * DRIVER over a scalar — the data-touching statement is still one
    * declarative aggregate.
    */
  def sqlScript(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """BEGIN
        |  DECLARE cap BIGINT DEFAULT 1;
        |  WHILE cap < 100000 DO
        |    SET cap = cap * 3;
        |  END WHILE;
        |  SELECT o_orderstatus, count(*) AS n,
        |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
        |  FROM orders
        |  WHERE o_totalprice < cap
        |  GROUP BY o_orderstatus
        |  ORDER BY o_orderstatus;
        |END""".stripMargin)
  }

  /** `GROUP BY ALL` / `ORDER BY ALL` (Spark 4 + DuckDB agree on the
    * semantic: group on every non-aggregate select item, order on every
    * select item left-to-right) — the keystroke-saving surface analysts
    * type first; the plan is the identical explicit GROUP BY.
    */
  def sqlGroupByAll(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       count(*) AS cnt,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin)
  }

  /** Named-parameter SQL (Spark 3.4+ `spark.sql(text, args)`): the
    * injection-proof parameterization discipline — `:floor` / `:status`
    * bind as TYPED literals at parse time, never string splicing. The
    * oracle states the bound query with the literals inlined, so a
    * parameter that binds to the wrong value or type shifts the hash.
    */
  def sqlParameterized(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT o_orderstatus, count(*) AS n,
        |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
        |FROM orders
        |WHERE o_totalprice >= :floor AND o_orderstatus <> :skip
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
      Map("floor" -> 150000, "skip" -> "P"))
  }

  /** Aggregate `FILTER (WHERE …)` clauses (standard SQL, Spark + DuckDB
    * native): per-condition conditional aggregation without CASE
    * scaffolding — one scan, one aggregate, N filtered measures.
    */
  def sqlAggFilter(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT o_orderstatus,
        |       count(*) AS n_all,
        |       count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |       coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |         FILTER (WHERE year(o_orderdate) = 1996), 0) AS cents_1996,
        |       count(DISTINCT o_custkey) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_cust_p0
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** SQL `UNPIVOT` (Spark 3.4+ parser clause): columns-to-rows as a
    * relational operator instead of a stack of UNION ALL branches — the
    * metrics-table reshape. NULL cells are dropped by UNPIVOT's
    * contract (none arise here: both metrics are non-null casts). The
    * DuckDB oracle restates the reshape as the explicit UNION ALL, so
    * the clause's include-nulls/ordering semantics are value-checked,
    * not just parsed.
    */
  def sqlUnpivot(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT o_orderstatus, metric, CAST(sum(v) AS BIGINT) AS total,
        |       count(*) AS n
        |FROM (
        |  SELECT o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         CAST(o_custkey AS BIGINT) AS cust
        |  FROM orders
        |) UNPIVOT (v FOR metric IN (cents, cust))
        |GROUP BY o_orderstatus, metric
        |ORDER BY o_orderstatus, metric""".stripMargin)
  }
}
