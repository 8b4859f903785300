package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality audit every ingestion pipeline runs
  * before trusting a feed: per-column row count, null count, distinct
  * count, and min/max rendered as strings (one schema for heterogeneous
  * column types).
  *
  * Plan shape: one independent two-level aggregate PER COLUMN, unioned.
  * The single-pass multi-column form (every aggregate side by side in one
  * `df.agg`) looks cheaper but is not: N exact `countDistinct`s in one
  * aggregate compile to a single Expand that replicates EVERY input row
  * N+1 times into the shuffle — a 5× scan-output amplification at N=4
  * (measured: the slowest query in the round-6 bench). Per-column branches
  * instead shuffle only each column's own distinct values (groupBy(col) →
  * count, then a one-row reduce), each branch's parquet scan reads exactly
  * one column, and the branches run in parallel. Exact-count distinct
  * keeps the oracle checkable; the 100 TB variant swaps in
  * approx_count_distinct with the same plan shape minus the groupBy level.
  */
object Profile {

  /** Columns chosen to cover int, string, and date renderings that are
    * byte-identical across engines (decimals deliberately excluded — their
    * string forms differ; cast or scale them first, as vec_quantize does).
    */
  private val OrdersColumns =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")

  def profileOrders(t: Tables): DataFrame = profileOf(t.orders, OrdersColumns)

  /** Referential-integrity audit across the schema's foreign keys: child
    * row count, orphaned-row count (left anti join against the parent
    * key), and the orphan fraction. Each relationship is one anti join
    * shuffled on the key — at 100 TB the parent key side is either
    * broadcast (dims) or the same shuffle any fact-dim join pays; child
    * rows never carry more than the key column through the check.
    */
  def fkCheck(t: Tables): DataFrame = {
    def rel(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans)
        .select(
          lit(name).as("relationship"), col("n_rows"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_rows"), 6).as("orphan_frac"))
    }
    rel("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey")
      .unionAll(rel("orders.o_custkey->customer", t.orders, "o_custkey", t.customer, "c_custkey"))
      .unionAll(rel("events.user_id->customer", t.events, "user_id", t.customer, "c_custkey"))
      .orderBy("relationship")
  }

  /** Rule-based data-quality expectations over orders — the CI gate an
    * ingestion pipeline runs per feed drop: each rule one output row
    * (rule, n_checked, n_failed). Violation thresholds are chosen so the
    * synthetic feed actually trips two rules (price cap, date ceiling) —
    * an expectations check whose every rule passes verifies nothing about
    * the failure path.
    *
    * Plan shape: all FLAG rules fold into ONE single-pass aggregate over
    * the table (a handful of conditional sums — no Expand, no per-rule
    * rescan; at 100 TB the whole rule set costs one scan), reshaped to
    * rows by an inline explode. The uniqueness rule is the one rule a
    * flag can't express; it runs as its own two-level aggregate (shuffle
    * = the key's distinct values, the same shape as [[profileOf]]) and
    * unions in. Violation predicates are written null-explicit
    * (`isNull || viol`) so a NULL never silently counts as a pass.
    */
  def dqCheck(t: Tables): DataFrame = {
    def fails(viol: Column): Column = sum(when(viol, 1L).otherwise(0L))
    val price = col("o_totalprice")
    val status = col("o_orderstatus")
    val odate = col("o_orderdate")
    val flags = t.orders.agg(
      count(lit(1)).as("n"),
      fails(col("o_custkey").isNull).as("f_null"),
      fails(price.isNull || price <= 0 || price > 300000).as("f_price"),
      fails(status.isNull || !status.isin("O", "F", "P")).as("f_status"),
      fails(odate.isNull || odate < lit("1995-01-01").cast("timestamp")
        || odate >= lit("2001-01-01").cast("timestamp")).as("f_date"))
    def ruleRow(name: String, failed: Column) =
      struct(lit(name).as("rule"), col("n").as("n_checked"), failed.as("n_failed"))
    val flagRows = flags.select(explode(array(
      ruleRow("not_null:o_custkey", col("f_null")),
      ruleRow("range:o_totalprice", col("f_price")),
      ruleRow("domain:o_orderstatus", col("f_status")),
      ruleRow("range:o_orderdate", col("f_date")))).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked").as("n_checked"),
        col("r.n_failed").as("n_failed"))
    // count(o_orderkey) at level 2 counts NON-NULL distinct keys — the
    // COUNT(DISTINCT) semantics the oracle states (NULL keys all count as
    // failures, never as one shared "distinct" value)
    val uniq = t.orders.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_checked"),
        (coalesce(sum(col("cnt")), lit(0L)) - count(col("o_orderkey"))).as("n_failed"))
      .select(lit("unique:o_orderkey").as("rule"), col("n_checked"), col("n_failed"))
    flagRows.unionAll(uniq).orderBy("rule")
  }

  def profileOf(df: DataFrame, columns: Seq[String]): DataFrame = {
    val perColumn: Seq[DataFrame] = columns.map { c =>
      // Level 1: distinct values of this one column with their row counts
      // (shuffle volume = the column's distinct values, nothing else).
      // Level 2: a one-row reduce over that — n from the counts, null rows
      // from the NULL group's count, distinct via count(v) (excludes NULL,
      // matching COUNT(DISTINCT c)), min/max over the distinct values.
      df.groupBy(col(c).as("v"))
        .agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_null"),
          count(col("v")).as("n_distinct"),
          min(col("v")).cast("string").as("min_s"),
          max(col("v")).cast("string").as("max_s"))
        .select(lit(c).as("column_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }
    perColumn.reduce(_.unionAll(_)).orderBy("column_name")
  }

  /** Freshness monitoring — the data-ops check every ingestion pipeline
    * pages on: per event type, the newest event and how far it lags the
    * newest event ANYWHERE in the table; a type whose lag exceeds the
    * staleness budget is flagged. "Now" is deliberately the table's own
    * high-water mark, not the wall clock — a pure function of the data,
    * so the check is reproducible, oracle-able, and meaningful on
    * historical snapshots. One partial+final aggregate (shuffle =
    * #types) plus a broadcast of the single global max; all integer µs.
    */
  def dqFreshness(t: Tables, budgetHours: Long = 6): DataFrame = {
    val perType = t.events
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_ev"),
        max(unix_micros(col("ts"))).as("max_us"))
    val global = perType.agg(max(col("max_us")).as("global_us"))
    perType.crossJoin(broadcast(global))
      .select(
        col("event_type"), col("n_ev"),
        timestamp_micros(col("max_us")).as("latest_ts"),
        (col("global_us") - col("max_us")).as("lag_us"),
        (col("global_us") - col("max_us") > budgetHours * 3600L * 1000000L)
          .as("is_stale"))
      .orderBy("event_type")
  }

  /** k-anonymity / l-diversity audit over the customer table — the
    * re-identification-risk check a data-release pipeline runs beside
    * [[graft.sources.Layouts.gdprErasure]] and `text_pii_scrub`:
    * customers are grouped by their QUASI-IDENTIFIER tuple (nation ×
    * market segment — the attributes an adversary can link from public
    * data), and each equivalence class reports its size (k-anonymity:
    * a class smaller than k isolates its members) and the number of
    * DISTINCT sensitive values inside it (l-diversity over the account
    * balance's sign+magnitude bucket: a class where everyone shares one
    * sensitive value leaks it even at large k). Thresholds k=10 / l=2
    * flag the violating classes; both numbers are exact counts, so the
    * audit is fully cross-engine.
    *
    * Plan shape: ONE scan, one partial+final aggregate at the
    * quasi-identifier grain (distinct-count of the bucketed sensitive
    * value rides the same aggregate). At 100 TB the shuffle is the
    * class count — the generalization grain is chosen to be coarse, so
    * this stays a dimension-sized result by construction.
    */
  def dqKAnonymity(t: Tables, k: Int = 10, l: Int = 2): DataFrame =
    t.customer
      .filter(col("c_nationkey").isNotNull && col("c_mktsegment").isNotNull)
      .select(col("c_nationkey"), col("c_mktsegment"),
        // sensitive-attribute bucket: sign + 1000-unit magnitude band of
        // the balance (exact integer arithmetic both engines)
        (floor(col("c_acctbal") / 1000.0)).cast("long").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(
        count(lit(1)).cast("long").as("class_size"),
        countDistinct(col("bal_band")).cast("long").as("l_distinct"))
      .select(
        col("c_nationkey"), col("c_mktsegment"),
        col("class_size"), col("l_distinct"),
        (col("class_size") < k).as("k_violation"),
        (col("l_distinct") < l).as("l_violation"))
      .orderBy("c_nationkey", "c_mktsegment")

  /** Distribution-drift monitoring (PSI — population stability index)
    * between a baseline and a current snapshot of orders, the check a
    * training pipeline runs before trusting a new feed drop against the
    * distribution its models were fit on. Two monitored features cover
    * both shapes: o_totalprice through FIXED integer bin edges (10 ×
    * 30 000-wide, clamped — edges must be frozen constants or the two
    * snapshots bin differently and PSI is meaningless) and
    * o_orderstatus as its own categorical bins. Snapshot = before/after
    * a fixed date cut, a pure function of the table.
    *
    * Per-bin PSI term: (n_c/N_c − n_b/N_b) · ln(n_c·N_b / (n_b·N_c)) —
    * every operand an exact integer count, each division/product one
    * IEEE op on exact values, so both engines evaluate identical
    * doubles (same discipline as text_quality's ln). A bin empty on
    * either side yields NULL (PSI's log is undefined there — the
    * standard ε-smoothing would un-anchor the oracle; NULL surfaces
    * "new/vanished category", itself the strongest drift signal).
    *
    * Plan shape: ONE scan of three columns, an in-row 2-way explode to
    * (feature, bin) grain, one partial+final aggregate (shuffle = the
    * ~13 (feature, bin) groups), and a 2-row broadcast of per-feature
    * totals. At 100 TB this is a single pass with a constant-size
    * shuffle — the cheapest possible drift check.
    */
  def dqDrift(t: Tables): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val rows = t.orders
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull
        && col("o_orderstatus").isNotNull)
      .select(
        when(col("o_orderdate") < cut, 1L).otherwise(0L).as("is_base"),
        least(lit(9), greatest(lit(0),
          floor(col("o_totalprice") / 30000.0).cast("int"))).as("pbin"),
        col("o_orderstatus").as("status"))
      .select(col("is_base"), explode(array(
        struct(lit("o_totalprice").as("feature"),
          concat(lit("b"), col("pbin").cast("string")).as("bin")),
        struct(lit("o_orderstatus").as("feature"),
          col("status").as("bin")))).as("fb"))
      .select(col("is_base"), col("fb.feature").as("feature"), col("fb.bin").as("bin"))
    val bins = rows.groupBy("feature", "bin").agg(
      sum(col("is_base")).as("n_base"),
      sum(lit(1L) - col("is_base")).as("n_curr"))
    val tot = bins.groupBy("feature")
      .agg(sum("n_base").as("tb"), sum("n_curr").as("tc"))
    bins.join(broadcast(tot), Seq("feature"))
      .select(col("feature"), col("bin"), col("n_base"), col("n_curr"),
        when(col("n_base") > 0 && col("n_curr") > 0,
          round((col("n_curr").cast("double") / col("tc")
              - col("n_base").cast("double") / col("tb"))
            * log(col("n_curr").cast("double") * col("tb")
              / (col("n_base").cast("double") * col("tc"))), 6))
          .as("psi"))
      .orderBy("feature", "bin")
  }

  /** Engine-neutral table CHECKSUMS — the replication / migration
    * integrity check: did the copy of this table land bit-identical in
    * the other system? Each row renders to ONE canonical string
    * (explicit per-field `coalesce(CAST(… AS STRING), '<null>')` — no
    * engine-specific NULL or float formatting can leak in: money is
    * integral cents, dates render ISO), hashes through the library's one
    * cross-engine hash ([[graft.util.HexFold]] over md5), and reduces
    * under the two classic order-free folds (SUM and BIT_XOR) plus the
    * row count. Any altered, dropped, duplicated, or reordered-schema
    * row shifts at least one fold.
    *
    * Overflow bound: each hash is < 2^32, so the int64 SUM holds exact
    * to ~2^31 rows per table (Spark 4's default ANSI mode makes a
    * breach a loud error, never a silent wrap). Beyond that — the
    * 100 TB deployment — emit the sum as DECIMAL(38,0) on both engines;
    * XOR and count are width-stable at any cardinality.
    *
    * The DuckDB oracle recomputes the identical definition in its own
    * engine — which is the OPERATIONAL claim itself: the checksum is
    * portable across systems, so two sides of a migration can each run
    * their native implementation and compare three numbers per table
    * instead of shipping data. Plan: one scan + one 1-row partial+final
    * aggregate per table (map-side folds; nothing shuffles but 32
    * partial rows per table).
    */
  def dqChecksum(t: Tables): DataFrame = {
    def canon(cols: Column*): Column =
      concat_ws("|", cols.map(c =>
        coalesce(c.cast("string"), lit("<null>"))): _*)
    def rowOf(name: String, df: DataFrame, canonCol: Column): DataFrame =
      df.select(graft.util.HexFold.u32(md5(canonCol.cast("binary"))).as("h"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("h")).as("sum_h"),
          expr("bit_xor(h)").as("xor_h"))
        .select(lit(name).as("tbl"), col("n_rows"), col("sum_h"), col("xor_h"))
    val customer = rowOf("customer", t.customer, canon(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_mktsegment"), round(col("c_acctbal") * 100).cast("long")))
    val orders = rowOf("orders", t.orders, canon(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long"),
      col("o_orderdate").cast("date")))
    val supplier = rowOf("supplier", t.supplier, canon(
      col("s_suppkey"), col("s_name"), col("s_nationkey"),
      round(col("s_acctbal") * 100).cast("long")))
    customer.unionAll(orders).unionAll(supplier).orderBy("tbl")
  }
}
