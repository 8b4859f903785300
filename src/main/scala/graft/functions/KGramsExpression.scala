package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass worker behind `graft_kgrams` — kept as a static method so
  * the codegen body is one call, mirroring [[SketchHash]].
  */
object KGramsHelper {

  /** All word k-grams of `text`: split on single spaces, drop empty
    * tokens, join every k-window with one space. Fewer than k tokens →
    * empty array. Exactly the semantics of the HOF pipeline
    * `transform(sequence(0, n-k), i -> concat_ws(' ', slice(toks, i+1, k)))`
    * over `filter(split(text, ' '), x -> x <> '')`.
    */
  def kgrams(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1).filter(_.nonEmpty)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_kgrams(text, k)` — all word k-grams of a string column in ONE
  * pass (split once, slide a window over the stored tokens).
  *
  * Why not the composed HOF form ([[graft.ops.TextAnalysis.kgrams]]'s
  * original shape): Catalyst inlines the shared `filter(split(text))`
  * sub-expression into every reference site, including the `slice` INSIDE
  * the per-gram lambda — so the interpreted evaluator re-splits the whole
  * document once per gram, O(len²) per row (measured: 70%+ of ngram_topk
  * and the dominant cost of decontaminate at sf0.1). This expression is
  * opaque to that inlining and linear. `k` must be a foldable positive
  * int. NULL text → NULL.
  */
case class KGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        right.eval() match {
          case k: Integer if k >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a positive int k, got $other")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_kgrams"

  override def nullSafeEval(text: Any, k: Any): Any =
    KGramsHelper.kgrams(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.KGramsHelper.kgrams($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KGrams =
    copy(left = newLeft, right = newRight)
}

object KGramsExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_kgrams"),
      new ExpressionInfo(classOf[KGrams].getName, "graft_kgrams"),
      (children: Seq[Expression]) => KGrams(children(0), children(1)))
}
