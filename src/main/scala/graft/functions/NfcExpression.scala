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
