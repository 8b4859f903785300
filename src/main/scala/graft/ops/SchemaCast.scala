package graft.ops

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Declarative record schemas with cast levels — basis's CommonModel
  * semantic: a schema is DECLARED (name, version, typed fields,
  * `unique_on`, optional value domains) separately from any realized
  * block, and casting between the realized and declared shape happens at
  * materialization under a chosen strictness. Two levels here, mirroring
  * basis's cast-level idea:
  *
  *  - LOOSE ([[castReport]]): every field is `try_cast` to its declared
  *    type; failures (uncastable / overflow), nulls in non-nullable
  *    fields, and out-of-domain values are COUNTED per field, data still
  *    flows. The report is the per-field data-contract dashboard.
  *  - STRICT ([[enforce]]): any field violation — or a duplicate of the
  *    declared `unique_on` key — quarantines the whole row; the gate
  *    reports total/clean/quarantined plus every reason's row count
  *    (reason rows are emitted from the SCHEMA, so the result shape is
  *    fixed and zero counts are visible, not absent).
  *
  * Schemas load from YAML (`resources/schemas`, the CommonModel file form)
  * and are validated at load: unknown type, duplicate field, `unique_on`
  * naming an undeclared field, malformed decimal precision all fail with
  * named errors before a session is touched.
  *
  * Scale shape: both levels are ONE table scan with conditional
  * aggregates (violation flags are plain projections; partial+final
  * sums). The uniqueness check adds the one unavoidable key-grain
  * exchange (count per `unique_on` key); everything else is map-side.
  * Cross-engine: `try_cast` ≡ DuckDB `TRY_CAST` (both null on overflow /
  * parse failure), domains are IN-lists, and all counts are exact
  * BIGINTs.
  */
object SchemaCast {

  final case class FieldSpec(
      name: String, tpe: DataType, declared: String,
      nullable: Boolean, domain: Seq[String])

  final case class SchemaSpec(
      name: String, version: Int, uniqueOn: Seq[String], fields: Seq[FieldSpec])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"schema spec: $msg")

  private val DecimalRe = "Decimal\\((\\d+),(\\d+)\\)".r

  /** basis CommonModel field-type names → Spark types. `Integer` is the
    * 32-bit declared width (narrowing from a realized int64 is exactly
    * the cast the loose level must try), `Long` the 64-bit one.
    */
  private def dataTypeOf(t: String): DataType = t match {
    case "Text" | "LongText" => StringType
    case "Integer" => IntegerType
    case "Long" => LongType
    case "Float" => DoubleType
    case "Boolean" => BooleanType
    case "Date" => DateType
    case "DateTime" => TimestampType
    case "Json" => StringType
    case DecimalRe(p, s) =>
      val (pi, si) = (p.toInt, s.toInt)
      if (pi < 1 || pi > 38 || si < 0 || si > pi)
        fail(s"bad decimal precision/scale in '$t'")
      DecimalType(pi, si)
    case other => fail(s"unknown field type '$other'")
  }

  def fromYaml(yaml: String): SchemaSpec = {
    val root =
      try new com.fasterxml.jackson.dataformat.yaml.YAMLMapper().readTree(yaml)
      catch { case e: Exception => fail(s"unparseable YAML: ${e.getMessage}") }
    if (root == null || !root.isObject) fail("top level must be an object")
    def str(n: JsonNode, f: String, where: String): String = {
      val v = n.get(f)
      if (v == null || !v.isTextual || v.asText.isEmpty)
        fail(s"$where: missing or non-string '$f'")
      v.asText
    }
    val name = str(root, "name", "schema")
    val version = Option(root.get("version")).map(_.asInt(1)).getOrElse(1)
    val fieldsNode = root.get("fields")
    if (fieldsNode == null || !fieldsNode.isArray || fieldsNode.isEmpty)
      fail("'fields' must be a non-empty array")
    val fields = fieldsNode.elements().asScala.toSeq.map { f =>
      val fn = str(f, "name", "field")
      val tn = str(f, "type", s"field '$fn'")
      val nullable = Option(f.get("nullable")).forall(_.asBoolean(true))
      val domain = Option(f.get("domain"))
        .map(d => d.elements().asScala.map(_.asText).toSeq)
        .getOrElse(Seq.empty)
      FieldSpec(fn, dataTypeOf(tn), tn, nullable, domain)
    }
    val names = fields.map(_.name)
    if (names.distinct.size != names.size)
      fail(s"duplicate fields: ${names.diff(names.distinct).distinct.mkString(",")}")
    val uniqueOn = Option(root.get("unique_on"))
      .map(u => u.elements().asScala.map(_.asText).toSeq)
      .getOrElse(Seq.empty)
    uniqueOn.foreach(u =>
      if (!names.contains(u)) fail(s"unique_on field '$u' is not declared"))
    SchemaSpec(name, version, uniqueOn, fields)
  }

  def fromResource(path: String): SchemaSpec = {
    val in = getClass.getResourceAsStream(path)
    if (in == null) fail(s"resource not found: $path")
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    fromYaml(text)
  }

  // ------------------------------------------------------------- casting

  private def castCol(f: FieldSpec): Column =
    expr(s"try_cast(${f.name} AS ${f.tpe.sql})")

  /** Per-field violation flags over `df` — the shared projection both
    * levels aggregate. For each declared field: `null_<f>` (null where
    * non-nullable), `castfail_<f>` (non-null source, null try_cast),
    * `domfail_<f>` (cast ok but outside the declared domain).
    */
  private def flagged(df: DataFrame, spec: SchemaSpec): DataFrame = {
    val flags = spec.fields.flatMap { f =>
      val src = col(f.name)
      val cast = castCol(f)
      Seq(
        (if (f.nullable) lit(false) else src.isNull).as(s"null_${f.name}"),
        (src.isNotNull && cast.isNull).as(s"castfail_${f.name}"),
        (if (f.domain.isEmpty) lit(false)
         else src.isNotNull && cast.isNotNull &&
           !cast.cast(StringType).isin(f.domain: _*))
          .as(s"domfail_${f.name}"))
    }
    df.select(col("*") +: flags: _*)
  }

  /** LOOSE cast report: one row per declared field with its violation
    * counts. One scan, partial+final conditional sums.
    */
  def castReport(df: DataFrame, spec: SchemaSpec): DataFrame = {
    val fl = flagged(df, spec)
    val aggs = spec.fields.flatMap { f =>
      Seq(
        sum(when(col(s"null_${f.name}"), 1L).otherwise(0L)).as(s"n_null_${f.name}"),
        sum(when(col(s"castfail_${f.name}"), 1L).otherwise(0L)).as(s"n_cast_${f.name}"),
        sum(when(col(s"domfail_${f.name}"), 1L).otherwise(0L)).as(s"n_dom_${f.name}"))
    }
    val totals = fl.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = spec.fields.map { f =>
      struct(
        lit(f.name).as("field"), lit(f.declared).as("declared"),
        col("n_rows"),
        col(s"n_null_${f.name}").as("n_null_violations"),
        col(s"n_cast_${f.name}").as("n_cast_fail"),
        col(s"n_dom_${f.name}").as("n_domain_fail"))
    }
    totals
      .select(explode(array(rows: _*)).as("r"))
      .select("r.*")
      .orderBy("field")
  }

  /** STRICT gate: reason → row count, with the reason set fixed by the
    * schema (`null:<f>` for non-nullable fields, `cast:<f>` for every
    * field, `domain:<f>` where a domain is declared, `dup:<k1,k2>` for
    * the unique_on key) plus `rows:total`, `rows:clean`,
    * `rows:quarantined`. A row is quarantined iff ANY reason hits it.
    */
  def enforce(df: DataFrame, spec: SchemaSpec): DataFrame = {
    val fl0 = flagged(df, spec)
    val fl =
      if (spec.uniqueOn.isEmpty) fl0.withColumn("dup_key", lit(false))
      else {
        // SQL uniqueness never counts NULL keys as duplicates of each
        // other (the oracle's IN-subquery agrees); without the guard,
        // Window.partitionBy groups NULLs together and would flag them
        val w = Window.partitionBy(spec.uniqueOn.map(col): _*)
        val keysNonNull = spec.uniqueOn.map(col(_).isNotNull).reduce(_ && _)
        fl0.withColumn("dup_key", keysNonNull && count(lit(1)).over(w) > 1)
      }
    val reasonCols = spec.fields.flatMap { f =>
      (if (f.nullable) Seq.empty
       else Seq(s"null:${f.name}" -> col(s"null_${f.name}"))) ++
        Seq(s"cast:${f.name}" -> col(s"castfail_${f.name}")) ++
        (if (f.domain.isEmpty) Seq.empty
         else Seq(s"domain:${f.name}" -> col(s"domfail_${f.name}")))
    } ++ (if (spec.uniqueOn.isEmpty) Seq.empty
          else Seq(s"dup:${spec.uniqueOn.mkString(",")}" -> col("dup_key")))
    val bad = reasonCols.map(_._2).reduce(_ || _)
    val aggs = reasonCols.zipWithIndex.map { case ((_, c), i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"c_$i")
    }
    val totals = fl.agg(
      count(lit(1)).as("n_total"),
      sum(when(bad, 1L).otherwise(0L)).as("n_quarantined") +: aggs: _*)
    val rows =
      struct(lit("rows:total").as("reason"), col("n_total").as("n_rows")) +:
      struct(lit("rows:clean").as("reason"),
        (col("n_total") - col("n_quarantined")).as("n_rows")) +:
      struct(lit("rows:quarantined").as("reason"),
        col("n_quarantined").as("n_rows")) +:
      reasonCols.zipWithIndex.map { case ((r, _), i) =>
        struct(lit(r).as("reason"), col(s"c_$i").as("n_rows"))
      }
    totals
      .select(explode(array(rows: _*)).as("r"))
      .select("r.*")
      .orderBy("reason")
  }

  /** Cast `df` to the declared shape (declared fields only, declared
    * order, declared types). LOOSE: each field is `try_cast`; cast
    * failures and out-of-domain values flow as NULL. STRICT: the same
    * projection guarded by `assert_true` — ANY violation (including a
    * `unique_on` duplicate) fails the job at execution time, so the
    * returned frame stays a lazy plan and a clean block passes through
    * untouched. This is basis's cast-at-materialization, levels and all.
    */
  def coerce(df: DataFrame, spec: SchemaSpec, strict: Boolean): DataFrame = {
    val casted = spec.fields.map { f =>
      val src = col(f.name)
      val cast = castCol(f)
      val v =
        if (f.domain.isEmpty) cast
        else when(cast.cast(StringType).isin(f.domain: _*), cast)
      v.as(f.name)
    }
    if (!strict) df.select(casted: _*)
    else {
      val fl = flagged(df, spec)
      val withDup =
        if (spec.uniqueOn.isEmpty) fl.withColumn("dup_key", lit(false))
        else fl.withColumn("dup_key",
          // same NULL-key rule as enforce(): NULLs violate nullability,
          // not uniqueness
          spec.uniqueOn.map(col(_).isNotNull).reduce(_ && _) &&
            count(lit(1)).over(Window.partitionBy(spec.uniqueOn.map(col): _*)) > 1)
      val bad = spec.fields.flatMap(f => Seq(
        col(s"null_${f.name}"), col(s"castfail_${f.name}"), col(s"domfail_${f.name}")))
        .reduce(_ || _) || col("dup_key")
      withDup
        .filter(assert_true(!bad, lit(s"schema '${spec.name}': strict cast violation")).isNull)
        .select(casted: _*)
    }
  }

  // ------------------------------------------------------------- queries

  /** The declared `event` schema (resources/schemas/event.yml) applied
    * LOOSELY to the realized events table: user_id narrows 64→32 bit
    * cleanly, value overflows Decimal(4,2) for every row ≥ 100, and
    * event_type's domain excludes 'error' — real violations of each
    * class on unmodified driver data.
    */
  def schemaCastReport(t: Tables): DataFrame =
    castReport(t.events, fromResource("/schemas/event.yml"))

  /** The same schema enforced STRICTLY (any violation or unique_on
    * duplicate quarantines the row).
    */
  def schemaEnforce(t: Tables): DataFrame =
    enforce(t.events, fromResource("/schemas/event.yml"))
}
