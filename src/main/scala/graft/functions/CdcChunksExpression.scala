package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass worker behind `graft_cdc_chunks` — static method so the
  * codegen body is one call, mirroring [[KGramsHelper]].
  */
object CdcChunksHelper {

  private val B = 257L
  private val M = 1000003L

  /** Content-defined chunks of `text`: a boundary falls AFTER codepoint
    * position `i` (1-based, `i >= w`) iff the polynomial hash of the
    * `w`-codepoint window ending at `i` — `fold(h=0; h = (h·257 + cp) mod
    * 1000003)` — is divisible by `div`. Chunks are the substrings between
    * consecutive boundaries (final chunk runs to the end). Boundaries are
    * a pure STATELESS function of local content: no min/max clamping, so
    * the rule is restatable per-position in SQL, and an insertion shifts
    * every later boundary POSITION but not the chunk CONTENTS after the
    * next surviving cut. Empty string → empty array. Defined over Unicode
    * codepoints (DuckDB `substr`/`unicode` semantics), not UTF-16 units.
    */
  def chunks(text: UTF8String, w: Int, div: Int): ArrayData = {
    val s = text.toString
    val nChars = s.length
    if (nChars == 0) return new GenericArrayData(Array.empty[Any])
    // codepoint array + char offset of each codepoint (off(n) = end)
    val n = s.codePointCount(0, nChars)
    val cps = new Array[Int](n)
    val off = new Array[Int](n + 1)
    var ci = 0
    var i = 0
    while (ci < nChars) {
      val cp = s.codePointAt(ci)
      cps(i) = cp
      off(i) = ci
      ci += Character.charCount(cp)
      i += 1
    }
    off(n) = nChars
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prev = 0 // codepoint index of current chunk start
    var p = w
    while (p <= n) {
      // refold the w-window ending at p (O(w) per position keeps the
      // arithmetic IDENTICAL to the per-position SQL restatement; w is
      // a small constant, so the pass stays O(w·n) linear)
      var h = 0L
      var j = p - w
      while (j < p) { h = (h * B + cps(j)) % M; j += 1 }
      if (h % div == 0L) {
        out += UTF8String.fromString(s.substring(off(prev), off(p)))
        prev = p
      }
      p += 1
    }
    if (prev < n) out += UTF8String.fromString(s.substring(off(prev), off(n)))
    new GenericArrayData(out.toArray)
  }
}

/** `graft_cdc_chunks(text, w, div)` — content-defined chunking (the
  * Rabin-hash boundary rule of dedup storage systems and FastCDC,
  * simplified to its stateless core): split a document wherever the
  * rolling hash of the last `w` codepoints ≡ 0 (mod `div`), giving
  * chunks of EXPECTED size `div` whose boundaries move with the content.
  * Fixed-offset chunking shares zero chunks between a document and a
  * one-character-shifted copy; content-defined boundaries re-synchronize
  * at the first cut after the edit, so all later chunks dedup exactly —
  * the property chunk-grain dedup needs on real corpora where near-dups
  * differ by insertions. One linear pass per row, codegen-opaque (no HOF
  * inlining blowup). `w`, `div` must be foldable positive ints. NULL
  * text → NULL.
  */
case class CdcChunks(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        (second.eval(), third.eval()) match {
          case (w: Integer, d: Integer) if w >= 1 && d >= 1 =>
            TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires positive int (w, div), got $other")
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int, foldable int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(text: Any, w: Any, div: Any): Any =
    CdcChunksHelper.chunks(
      text.asInstanceOf[UTF8String], w.asInstanceOf[Int], div.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, d) =>
      s"${ev.value} = graft.functions.CdcChunksHelper.chunks($t, $w, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CdcChunks =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcChunksExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (children: Seq[Expression]) => CdcChunks(children(0), children(1), children(2)))
}
