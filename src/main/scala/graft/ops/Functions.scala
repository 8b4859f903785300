package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Relational.{dbl, dec}

/** Scalar-function operators (SURVEY.md §2.2): string / regexp / date /
  * math / conditional / cast / json / array. Everything here is a builtin
  * `org.apache.spark.sql.functions` call — fully whole-stage-codegen'd, no
  * UDF in the hot path.
  */
object Functions {

  def fnString(t: Tables): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("u"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 8).as("sub"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("tr"),
        regexp_replace(col("p_type"), lit(" "), lit("_")).as("rep"),
        length(col("p_name")).as("len"),
        lpad(col("p_size").cast(StringType), 4, "0").as("pad"))
      .orderBy("p_partkey")
      .limit(500)

  def fnRegexp(t: Tables): DataFrame =
    t.part
      .filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), lit("[aeiou]"), lit("*")).as("starred"))
      .orderBy("p_partkey")

  /** Table-function regex surface: every `[a-z]{4,}` match in a document
    * as its own row with a stable 0-based match index — regexp as a
    * generator (posexplode over regexp_extract_all), not just a scalar.
    * Pure map-side fan-out, no shuffle.
    */
  def fnRegexpTable(t: Tables): DataFrame =
    t.documents
      .filter(col("doc_id") < 500)
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("text"), lit("[a-z]{4,}"), lit(0)))
          .as(Seq("match_idx", "m")))
      .orderBy("doc_id", "match_idx")

  def fnDate(t: Tables): DataFrame =
    t.orders
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("mon"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        (col("o_orderdate") + expr("INTERVAL '90' DAY")).cast(DateType).as("due"))
      .orderBy("o_orderkey")
      .limit(2000)

  /** Week/quarter-oriented calendar surface (fn_date covers the
    * year/month/day axis): ISO week truncation and numbering, quarter,
    * day-of-week (Spark's 1=Sunday convention; the oracle shifts DuckDB's
    * 0=Sunday by one), end-of-month, and day distance to a fixed horizon.
    */
  def fnDate2(t: Tables): DataFrame =
    t.orders
      .select(
        col("o_orderkey"),
        date_trunc("week", col("o_orderdate")).cast(DateType).as("wk"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"),
        last_day(col("o_orderdate")).as("eom"),
        datediff(lit("1998-01-01").cast(DateType), col("o_orderdate")).as("days_to_98"))
      .orderBy("o_orderkey")
      .limit(2000)

  def fnMath(t: Tables): DataFrame =
    t.orders
      .select(
        col("o_orderkey"),
        dbl(abs(dec(col("o_totalprice")) - lit(BigDecimal("150000.00")))).as("dist"),
        ceil(col("o_totalprice") / 1000.0).cast(LongType).as("ceil_k"),
        floor(col("o_totalprice") / 1000.0).cast(LongType).as("floor_k"),
        (col("o_orderkey") % 7).as("m7"),
        round(sqrt(col("o_orderkey")), 6).as("rt"))
      .orderBy("o_orderkey")
      .limit(2000)

  def fnCaseCoalesce(t: Tables): DataFrame =
    t.orders
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 250000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"),
        greatest(col("o_orderkey"), col("o_custkey")).as("g"),
        least(col("o_orderkey"), col("o_custkey")).as("l"))
      .orderBy("o_orderkey")
      .limit(2000)

  def fnCast(t: Tables): DataFrame =
    t.customer
      .select(
        col("c_custkey"),
        col("c_custkey").cast(StringType).as("s"),
        dec(col("c_acctbal")).cast(StringType).as("bal_s"),
        substring(col("c_custkey").cast(StringType), 1, 2).cast(IntegerType).as("pre"))
      .orderBy("c_custkey")
      .limit(500)

  /** basis `Json` field type → string column + path extraction. */
  def fnJson(t: Tables): DataFrame =
    t.events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .orderBy("event_id")
      .limit(3000)

  /** VARIANT semi-structured surface (Spark 4.0+): each event's flat
    * `props` JSON is deterministically enriched into a NESTED document
    * (object-in-object + array), parsed ONCE into a `VariantType` value,
    * and fields come back out through typed `variant_get` paths — nested
    * object, array index, and a missing path through `try_variant_get`
    * (NULL, not an error). Variant is the modern shape of the schema-
    * on-read column: parse once into a binary-encoded value, extract many
    * times without re-tokenizing the JSON text — at 100 TB the difference
    * between one parse and one parse PER extracted field. All builtins,
    * pure map-side, no shuffle before the output sort.
    */
  def fnVariant(t: Tables): DataFrame =
    t.events
      .select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .filter(col("k").isNotNull)
      // row selection BEFORE the variant work (same fn_try discipline,
      // r16): the top-3000 unique event_ids are decided by the filter
      // and key alone, so building + parsing the nested document for the
      // ~97k rows the limit drops was pure waste
      .orderBy("event_id")
      .limit(3000)
      .select(
        col("event_id"),
        parse_json(concat(
          lit("{\"id\": "), col("event_id").cast(StringType),
          lit(", \"meta\": {\"type\": \""), col("event_type"),
          lit("\", \"k\": "), col("k").cast(StringType),
          lit("}, \"tags\": ["), (col("event_id") % 7).cast(StringType),
          lit(", "), (col("event_id") % 11).cast(StringType),
          lit("]}"))).as("v"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.meta.type', 'string')").as("vtype"),
        expr("variant_get(v, '$.meta.k', 'bigint')").as("vk"),
        expr("variant_get(v, '$.tags[1]', 'bigint')").as("vtag"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("vmiss"))
      .orderBy("event_id")
      .limit(3000)

  /** `mask()` — format-preserving PII masking (the governance sibling of
    * `text_pii_scrub`'s regex redaction): uppercase→X, lowercase→x,
    * digit→n, punctuation kept by default, every class overridable —
    * the shape-preserving de-identification a data-share hands out so
    * downstream validation (lengths, formats) still works on masked
    * data. Codegen'd builtin, pure map-side.
    */
  def fnMask(t: Tables): DataFrame =
    t.supplier
      .select(
        col("s_suppkey"),
        expr("mask(s_name)").as("masked"),
        expr("mask(s_name, 'A', 'a', '9', '_')").as("custom"),
        expr("mask(concat(s_name, '-', CAST(s_nationkey AS STRING)))").as("mixed"))
      .orderBy("s_suppkey")
      .limit(500)

  /** `to_csv` / `from_csv` — the in-row CSV codec (schema-on-read over a
    * CSV-typed COLUMN, not a file) on a QUOTING-HOSTILE corpus: every
    * row's middle field is planted with the three hazards the RFC-4180
    * escape discipline exists for — an embedded delimiter, an embedded
    * quote pair, an embedded newline — so the writer MUST quote and
    * double (escape='"', the Feeds.writeOne convention DuckDB's dialect
    * reads). Three independent pins, all DuckDB-recomputable:
    *   - `csv_md5`: hash of the EXACT rendered bytes vs the oracle's
    *     arithmetic reconstruction (k,"h-with-doubled-quotes",nk) —
    *     a backslash-escape or no-quote mode changes the bytes even
    *     where it wouldn't change the length;
    *   - `csv_len`: the doubled-quote length formula;
    *   - `h_ok`/`nk_rt`: from_csv round-trips the hostile field and the
    *     trailing number intact THROUGH the quoted newline.
    */
  def fnCsv(t: Tables): DataFrame =
    t.supplier
      .select(col("s_suppkey"), col("s_nationkey"),
        concat(col("s_name"), lit(",\""),
          col("s_nationkey").cast(StringType), lit("\"\nx")).as("h"))
      .select(col("s_suppkey"), col("s_nationkey"), col("h"),
        expr("""to_csv(named_struct('k', s_suppkey, 'h', h, 'nk', s_nationkey),
                       map('escape', '"'))""").as("csv"))
      .select(col("s_suppkey"), col("h"),
        md5(col("csv")).as("csv_md5"),
        length(col("csv")).cast(LongType).as("csv_len"),
        expr("""from_csv(csv, 'k BIGINT, h STRING, nk BIGINT',
                         map('escape', '"'))""").as("p"))
      .select(col("s_suppkey"), col("csv_md5"), col("csv_len"),
        (col("p.h") === col("h")).as("h_ok"),
        col("p.nk").as("nk_rt"))
      .orderBy("s_suppkey")
      .limit(500)

  /** Third string tranche: `split_part` (1-indexed field extraction —
    * the delimited-feed workhorse), the predicate trio
    * startswith/endswith/contains as COLUMNS (not filters), and
    * fixed-width lpad/rpad. All codegen'd builtins; DuckDB spells the
    * predicates starts_with/suffix/contains with identical semantics.
    */
  def fnString3(t: Tables): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        expr("split_part(p_name, ' ', 2)").as("w2"),
        expr("split_part(p_type, ' ', -1)").as("type_last"),
        expr("startswith(p_name, 'a')").as("sw"),
        expr("endswith(p_name, 'd')").as("ew"),
        expr("contains(p_name, 'green')").as("hasg"),
        lpad(col("p_brand"), 12, "#").as("lp"),
        rpad(col("p_type"), 30, ".").as("rp"))
      .orderBy("p_partkey")
      .limit(500)

  /** COLLATION-aware grouping (Spark 4.0+ `collate(…, 'UTF8_LCASE')`):
    * case-insensitive semantics expressed as a COLLATION on the value,
    * not a lower() rewrite scattered through the query — the engine
    * feature that makes case-insensitive joins/groups declarative.
    * Event types are case-mangled DETERMINISTICALLY per row (the
    * non-vacuity pattern: without it every group has one raw variant
    * and the collation proves nothing); the group key is the LCASE
    * collation, the emitted key is lower() of any member (deterministic
    * — all members lower to the same string), and the raw-variant
    * DISTINCT count stays on the default binary collation so it counts
    * the case variants the collation collapsed.
    */
  def fnCollation(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """WITH m AS (
        |  SELECT CASE CAST(event_id % 3 AS INT)
        |           WHEN 0 THEN upper(event_type)
        |           WHEN 1 THEN lower(event_type)
        |           ELSE event_type END AS mangled
        |  FROM events WHERE event_type IS NOT NULL
        |)
        |SELECT lower(any_value(mangled)) AS etype,
        |       count(*) AS n,
        |       count(DISTINCT mangled) AS n_raw_variants
        |FROM m
        |GROUP BY collate(mangled, 'UTF8_LCASE')
        |ORDER BY etype""".stripMargin)
  }

  /** Calendar interval arithmetic — the date-math battery beside the
    * extraction ladder ([[fnDateTrunc]]): month addition WITH the
    * end-of-month clamp (Jan 31 + 1mo = Feb 29/28 — both engines use
    * the Postgres clamp rule), end-of-month, day deltas, next-weekday
    * (restated arithmetically in the oracle — DuckDB has no next_day),
    * quarter/day-of-year parts and first-of-month reconstruction via
    * make_date. All codegen'd builtins, pure map-side.
    */
  def fnInterval(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderkey"), col("o_orderdate").cast(DateType).as("d"))
      .select(
        col("o_orderkey"), col("d"),
        add_months(col("d"), 2).as("plus2m"),
        last_day(col("d")).as("eom"),
        datediff(lit("1998-12-31").cast(DateType), col("d"))
          .cast(LongType).as("days_left"),
        next_day(col("d"), "Mon").as("next_mon"),
        quarter(col("d")).cast(LongType).as("q"),
        dayofyear(col("d")).cast(LongType).as("doy"),
        expr("make_date(year(d), month(d), 1)").as("month_start"))
      .orderBy("o_orderkey")
      .limit(3000)

  /** ANSI-safe arithmetic (`try_divide` / `try_add` / `try_multiply` /
    * `try_cast`): Spark 4 runs ANSI mode by default, where division by
    * zero, integer overflow and bad casts THROW — the `try_*` family is
    * the production spelling for feeds where a poisoned row must become
    * NULL instead of killing the job. Each failure class is exercised
    * deterministically: every 5th key divides by zero, key 0 is the one
    * Long.MaxValue addition that does NOT overflow, the status string
    * never parses as a number, the stringified key always does. All
    * codegen'd builtins, pure map-side.
    */
  def fnTry(t: Tables): DataFrame =
    // Row selection FIRST (top-3000 by unique key — same rows either
    // way), try-expressions after: every try_add/try_multiply here
    // overflows by design, and a thrown-and-caught ArithmeticException
    // per row priced the old shape (exprs below the TakeOrdered) at the
    // whole table instead of the 3000 survivors — measured 7.6 s → 0.3 s
    // at sf0.1 (r16).
    t.orders
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
      .limit(3000)
      .select(
        col("o_orderkey"),
        expr("ROUND(try_divide(CAST(round(o_totalprice * 100) AS BIGINT)," +
          " o_orderkey % 5), 6)").as("div_mod5"),
        expr("try_add(9223372036854775807L, o_orderkey)").as("add_ovf"),
        expr("try_multiply(o_orderkey, 4611686018427387904L)").as("mul_ovf"),
        expr("try_cast(o_orderstatus AS BIGINT)").as("bad_cast"),
        expr("try_cast(CAST(o_orderkey AS STRING) AS BIGINT)").as("good_cast"))
      .orderBy("o_orderkey")

  /** Higher-order array functions (lambda surface): transform / filter /
    * exists / forall / zip_with / aggregate over a per-row integer array
    * (`sequence(1, …)` — engine-neutral, unlike the float embeddings).
    * Outputs reduce to scalars (sums / counts / flags) because the
    * CONTRACT is the lambda semantics, not array rendering. All lambdas
    * stay inside whole-stage codegen — the reason to prefer this surface
    * over a UDF for any per-element logic.
    */
  def fnLambda(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"), expr("sequence(1L, vec_id % 5 + 3)").as("arr"))
      .select(
        col("vec_id"),
        expr("aggregate(transform(arr, x -> x * x), 0L, (a, x) -> a + x)")
          .as("sum_sq"),
        expr("CAST(size(filter(arr, x -> x % 2 = 0)) AS BIGINT)").as("n_even"),
        expr("exists(arr, x -> x % 7 = 0)").as("has_7"),
        expr("forall(arr, x -> x > 0)").as("all_pos"),
        expr("aggregate(zip_with(arr, reverse(arr), (a, b) -> a * b), 0L," +
          " (a, x) -> a + x)").as("sum_prod"))
      .orderBy("vec_id")

  /** The full `date_trunc` grain ladder over event timestamps — the
    * bucketing primitive every time-partitioned rollup leans on, at all
    * seven grains in one projection (pure codegen'd builtins; Spark and
    * DuckDB agree on ISO-Monday weeks). Emitted as timestamps; the
    * driver compare renders both engines' values identically.
    */
  def fnDateTrunc(t: Tables): DataFrame =
    t.events
      .filter(col("ts").isNotNull)
      .select(
        col("event_id"),
        date_trunc("year", col("ts")).as("t_year"),
        date_trunc("quarter", col("ts")).as("t_quarter"),
        date_trunc("month", col("ts")).as("t_month"),
        date_trunc("week", col("ts")).as("t_week"),
        date_trunc("day", col("ts")).as("t_day"),
        date_trunc("hour", col("ts")).as("t_hour"),
        date_trunc("minute", col("ts")).as("t_minute"))
      .orderBy("event_id")
      .limit(3000)

  /** Advanced string surface: translate / reverse / repeat / find /
    * prefix-suffix slicing — all codegen'd builtins.
    */
  def fnString2(t: Tables): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        translate(col("p_type"), "AEIOU", "aeiou").as("tr"),
        reverse(col("p_brand")).as("rev"),
        expr("repeat('ab', p_size % 3 + 1)").as("rep"),
        instr(col("p_name"), "green").cast(LongType).as("pos"),
        substring(col("p_name"), 1, 6).as("l6"),
        substring(col("p_brand"), -3, 3).as("r3"))
      .orderBy("p_partkey")
      .limit(500)

  /** MapType surface: construct, access, enumerate. No map column exists
    * in the testdata and DuckDB↔Spark map parquet round-trips are fragile,
    * so this is a rows-only query (ApproxMapSpec covers behavior).
    */
  def fnMap(t: Tables): DataFrame =
    t.events
      .select(
        col("event_id"),
        map(
          lit("type"), col("event_type"),
          lit("user"), col("user_id").cast(StringType)).as("m"))
      .select(
        col("event_id"),
        element_at(col("m"), "type").as("ty"),
        element_at(col("m"), "missing").as("absent"),
        size(col("m")).as("n_entries"),
        array_join(map_keys(col("m")), ",").as("ks"))
      .orderBy("event_id")
      .limit(1000)

  /** Array ops over the 64-dim embedding vectors, incl. a higher-order
    * `aggregate` fold for the element sum.
    */
  def fnArray(t: Tables): DataFrame =
    t.embeddings
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast(DoubleType), 6).as("first_el"),
        round(
          aggregate(col("embedding"), lit(0.0),
            (s, x) => s + x.cast(DoubleType)), 4).as("vsum"))
      .orderBy("vec_id")

  /** Bitwise surface — and/or/xor, shifts, popcount — the key-packing
    * primitives the sketch/z-order layers build on; all codegen'd.
    */
  def fnBits(t: Tables): DataFrame =
    t.orders
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("o_orderkey").bitwiseOR(lit(1024L)).as("bor"),
        col("o_orderkey").bitwiseXOR(lit(4095L)).as("bxor"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 3).as("shr"),
        bit_count(col("o_orderkey")).cast(LongType).as("bcnt"))
      .orderBy("o_orderkey")
      .limit(2000)

  /** StructType surface: construct (named + nested), extract by field
    * path, and use a struct as a lexicographic comparison unit
    * (`least`/`greatest` on structs compare field-by-field in declaration
    * order — the tuple-ordering idiom every argmax/tie-break in this repo
    * leans on). Extraction happens in the SAME projection that builds the
    * structs, so Catalyst collapses the whole thing to scalar expressions
    * (no struct ever materializes — `explain` shows a flat Project), which
    * is exactly what makes nested-struct ergonomics free at scale. Output
    * is scalar-only: parquet/pandas nested-struct rendering differs
    * between engines, values inside do not.
    */
  def fnStruct(t: Tables): DataFrame = {
    val o = struct(
      col("o_orderstatus").as("st"),
      dec(col("o_totalprice")).as("price"),
      struct(col("o_custkey").as("ck"),
        col("o_orderpriority").as("pri")).as("who"))
    val alt = struct(
      lit("F").as("st"),
      dec(lit(300000)).as("price"),
      struct(lit(0L).as("ck"), lit("5-LOW").as("pri")).as("who"))
    t.orders
      .select(
        col("o_orderkey"),
        o.getField("st").as("st"),
        dbl(o.getField("price")).as("price"),
        o.getField("who").getField("ck").as("ck"),
        o.getField("who").getField("pri").as("pri"),
        dbl(least(o, alt).getField("price")).as("lo_price"),
        greatest(o, alt).getField("st").as("hi_st"))
      .orderBy("o_orderkey")
      .limit(2000)
  }
}
