package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** URL handling for web-scale corpora: structured component extraction
  * (`parse_url`) and canonicalization-based dedup — the first gate of
  * every crawl pipeline (the same page arrives as `http`/`https`,
  * host-case, trailing-slash, and `utm_*`-tracking variants; naive exact
  * dedup sees four distinct documents).
  *
  * The test corpus has no URL column, so both queries SYNTHESIZE a
  * deterministic URL per document (the [[TextAnalysis]] PII-planting
  * discipline): four documents share each base URL, each dressed in a
  * different variant class, so the canonicalizer provably collapses 4:1
  * and every variant class is exercised. The DuckDB oracle synthesizes
  * the identical strings and canonicalizes them with its OWN string/list
  * functions — agreement checks the rules, not a shared implementation.
  */
object Urls {

  /** doc → (doc_id, url): base id shared by groups of 4, variant class
    * by doc_id mod 4.
    */
  private def withUrl(t: Tables): DataFrame = {
    val baseId = (col("doc_id") - pmod(col("doc_id"), lit(4))).cast(LongType)
    val v = pmod(col("doc_id"), lit(4))
    t.documents.select(
      col("doc_id"),
      when(v === 0, concat(lit("https://www.example.com/docs/"), baseId))
        .when(v === 1, concat(lit("HTTPS://WWW.EXAMPLE.COM/docs/"), baseId, lit("/")))
        .when(v === 2, concat(lit("https://www.example.com/docs/"), baseId,
          lit("?utm_source=feed&utm_campaign=x")))
        .otherwise(concat(lit("https://www.example.com/docs/"), baseId,
          lit("?id=9&utm_medium=email")))
        .as("url"))
  }

  /** `parse_url` component extraction (protocol / host / path / query /
    * one query parameter) — Spark's codegen'd java.net.URI surface; the
    * oracle restates each component with DuckDB regexes (NULLIF''d to
    * match parse_url's null-on-absent semantics).
    */
  def fnUrl(t: Tables): DataFrame =
    withUrl(t)
      .select(
        col("doc_id"),
        parse_url(col("url"), lit("PROTOCOL")).as("scheme"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("utm_source")).as("utm_source"))
      .orderBy("doc_id")

  /** The canonical form: lowercase scheme+host, trailing slashes
    * stripped, `utm_*` tracking params dropped, empty query omitted.
    * Pure regexp + array HOFs so the oracle can state the SAME rules
    * independently.
    */
  private def canonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val path = rtrim(regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/")
    val kept = filter(
      split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => !startswith(p, lit("utm_")) && p =!= "")
    concat(
      scheme, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Canonicalization dedup: the scheme-case, host-case/trailing-slash,
    * and pure-tracking-query variants collapse 3:1 onto their canonical
    * URL, while the `?id=9&utm_medium=…` variant keeps its REAL
    * parameter and stays distinct — canonicalization must merge
    * presentation variants without merging genuinely different
    * resources, and the planted corpus exercises both directions. One
    * shuffle keyed by the canonical string — bodies never move, the
    * 100 TB crawl-dedup shape.
    */
  def dedupUrlCanonical(t: Tables): DataFrame =
    withUrl(t)
      .select(col("doc_id"), canonical(col("url")).as("canon_url"))
      .groupBy("canon_url")
      .agg(
        count(lit(1)).cast(LongType).as("n_variants"),
        min(col("doc_id")).as("keep_id"),
        countDistinct(col("doc_id")).cast(LongType).as("n_docs"))
      .orderBy("keep_id")
}
