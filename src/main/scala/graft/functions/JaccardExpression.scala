package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Set-semantics kernel shared by interpreted eval and generated code
  * (invoked via its static forwarder from whole-stage codegen). Inputs
  * are distinct-element arrays (collect_set output); |∪| = n₁+n₂−|∩|.
  */
object JaccardKernel {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    val set = new java.util.HashSet[UTF8String](math.max(8, n1 * 2))
    var i = 0
    while (i < n1) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < n2) { if (set.contains(b.getUTF8String(i))) inter += 1; i += 1 }
    val union = n1 + n2 - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** `graft_jaccard(a, b)` — Jaccard similarity of two string SETS, equal by
  * construction to `size(array_intersect(a,b)) / size(array_union(a,b))`
  * on distinct-element inputs, but one hash-set pass instead of two
  * intermediate array materializations. Used by the similarity re-rank
  * paths where candidate volume makes the builtin pair the hot spot.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardKernel.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "graft_jaccard"),
      (children: Seq[Expression]) => JaccardSimilarity(children(0), children(1)))
}
