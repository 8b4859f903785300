package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Worker behind `graft_nfc` — static so the codegen body is one call
  * (the [[KGramsHelper]] pattern). Two fast paths, cheapest first: a
  * pure-ASCII byte scan over the UTF8String (NO String materializes —
  * ASCII is NFC by definition, and it is the overwhelmingly-common row
  * in a web corpus), then `Normalizer.isNormalized` for non-ASCII text
  * that is already composed (one String copy, no normalize allocation).
  */
object NfcHelper {
  def nfc(text: UTF8String): UTF8String = {
    val n = text.numBytes
    var i = 0
    while (i < n && (text.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return text // pure ASCII: NFC-invariant, zero allocation
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` — Unicode canonical composition (NFC), the
  * normalization step a web-scale text pipeline runs before anything
  * hashes, deduplicates, or tokenizes: the SAME visible string arrives
  * from the wild as composed (é = U+00E9) and decomposed (e + U+0301)
  * byte sequences, and every downstream equality — exact dedup hashes,
  * MinHash shingles, BPE merges — silently treats them as different
  * documents until the codepoints are canonicalized. Spark has no
  * built-in for this (DuckDB ships `nfc_normalize`); a Scala UDF would
  * work but falls out of whole-stage codegen — this expression stays
  * inside it, one static call per row. NULL in → NULL out.
  */
case class Nfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(text: Any): Any =
    NfcHelper.nfc(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NfcHelper.nfc($t);")

  override protected def withNewChildInternal(newChild: Expression): Nfc =
    copy(child = newChild)
}

object NfcExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[Nfc].getName, "graft_nfc"),
      (children: Seq[Expression]) => Nfc(children.head))
}

/** Worker behind `graft_nfkc_cf`. ASCII fast path first (ASCII is
  * NFKC-invariant and its casefold is byte lowercasing — zero allocation
  * when already lowercase, one UTF8String lowercase otherwise); the
  * general path iterates NFKC ∘ lowercase to a FIXPOINT, because one
  * pass is not idempotent: compatibility mappings can surface NEW
  * uppercase (㎅ → "KB", ﬅ → "st"-adjacent forms) that the lowercase of
  * the PREVIOUS round never saw. The fixpoint converges in ≤3 rounds on
  * real text (the cap is a defensive bound, not a tuning knob) and makes
  * the function idempotent BY CONSTRUCTION — the property NfcSpec pins.
  */
object NfkcCfHelper {
  def nfkcCf(text: UTF8String): UTF8String = {
    val n = text.numBytes
    var i = 0
    var hasUpper = false
    while (i < n && (text.getByte(i) & 0x80) == 0) {
      val b = text.getByte(i)
      if (b >= 'A' && b <= 'Z') hasUpper = true
      i += 1
    }
    if (i == n) return if (hasUpper) text.toLowerCase else text
    var s = text.toString
    var prev: String = null
    var rounds = 0
    while (s != prev && rounds < 8) {
      prev = s
      s = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
        .toLowerCase(java.util.Locale.ROOT)
      rounds += 1
    }
    UTF8String.fromString(s)
  }
}

/** `graft_nfkc_cf(text)` — NFKC compatibility normalization plus Root-
  * locale case folding, iterated to a fixpoint: the normalization a
  * web-dedup pipeline runs BEFORE hashing when it wants "the same text
  * to a reader" to hash equal — ligatures (ﬁ → fi), full-width forms
  * (Ａ → a), squared units (㎅ → kb), and case all collapse, where NFC
  * alone collapses none of them. Deliberately engine-specific (DuckDB
  * has no NFKC oracle): registered rows-only, with NfcSpec property
  * pins (idempotence, ASCII fast path, known compatibility pairs) per
  * the unigram-tokenizer pattern. Uses simple (locale-independent) case
  * mapping, not full Unicode case folding — ß stays ß; documented, and
  * fine for a dedup key as long as BOTH sides of every comparison fold
  * the same way. NULL in → NULL out.
  */
case class NfkcCf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfkc_cf"

  override def nullSafeEval(text: Any): Any =
    NfkcCfHelper.nfkcCf(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NfkcCfHelper.nfkcCf($t);")

  override protected def withNewChildInternal(newChild: Expression): NfkcCf =
    copy(child = newChild)
}

object NfkcCfExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_nfkc_cf"),
      new ExpressionInfo(classOf[NfkcCf].getName, "graft_nfkc_cf"),
      (children: Seq[Expression]) => NfkcCf(children.head))
}
