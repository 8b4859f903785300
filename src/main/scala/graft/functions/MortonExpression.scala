package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** `graft_morton(bits, c0, c1, ...)` — bit-interleaved Morton z-value of k
  * pre-scaled non-negative long columns (column j's bit i lands at
  * position i·k + j), the native twin of [[graft.sources.ZOrder.interleave]].
  *
  * The composed form expands to bits·k shift/and/or Column nodes — at the
  * layout-write sweet spot (k=3, bits=16) that is a 48-term expression
  * tree, which Catalyst must analyze, optimize, and codegen as 48 nested
  * method-size-bounded blocks per row. This expression generates k tight
  * Java loops instead: same z-values bit for bit (ZOrderSpec proves
  * equality on random inputs), a constant-size plan node regardless of
  * bits, and one JIT-friendly loop nest in the generated code. `bits`
  * must be a foldable integral literal — it is baked into the generated
  * code, not evaluated per row.
  */
case class MortonInterleave(bitsExpr: Expression, cols: Seq[Expression])
    extends Expression {

  override def children: Seq[Expression] = bitsExpr +: cols

  // range-checked in checkInputDataTypes before intValue can truncate
  private lazy val bits: Int = bitsExpr.eval().asInstanceOf[Number].longValue().toInt

  override def checkInputDataTypes(): TypeCheckResult = {
    val integral = bitsExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!bitsExpr.foldable || !integral || bitsExpr.eval() == null)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-null foldable integral bits argument")
    if (cols.isEmpty || !cols.forall(_.dataType == LongType))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires one or more bigint columns, got " +
          cols.map(_.dataType.simpleString).mkString(", "))
    // bound each factor BEFORE multiplying — bits*k in Int would overflow
    // for absurd literals (e.g. 2^30 bits x 4 cols wraps past 63)
    val b = bitsExpr.eval().asInstanceOf[Number].longValue()
    if (b < 1 || b > 63 || cols.size > 63 || b * cols.size > 63)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ${cols.size} cols x $b bits exceeds a long")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = cols.exists(_.nullable)

  override def prettyName: String = "graft_morton"

  override def eval(input: InternalRow): Any = {
    val k = cols.size
    var z = 0L
    var j = 0
    while (j < k) {
      val v = cols(j).eval(input)
      if (v == null) return null
      val lv = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        z |= ((lv >>> i) & 1L) << (i * k + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = cols.size
    val evals = cols.map(_.genCode(ctx))
    val childBlocks = evals.map(_.code).reduce(_ + _)
    val nullCheck =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val loops = evals.zipWithIndex.map { case (e, j) =>
      val i = ctx.freshName("i")
      s"for (int $i = 0; $i < $bits; $i++) { " +
        s"${ev.value} |= ((${e.value} >>> $i) & 1L) << ($i * $k + $j); }"
    }.mkString("\n")
    ev.copy(code =
      code"""
        $childBlocks
        boolean ${ev.isNull} = $nullCheck;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          $loops
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MortonInterleave =
    copy(bitsExpr = newChildren.head, cols = newChildren.tail)
}

object MortonExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "graft_morton"),
      (children: Seq[Expression]) => MortonInterleave(
        children.head,
        // widen INTEGRAL columns only — a blanket Cast would silently
        // truncate doubles/strings instead of failing analysis
        children.tail.map(c => c.dataType match {
          case LongType => c
          case ByteType | ShortType | IntegerType => Cast(c, LongType)
          case _ => c // let checkInputDataTypes reject it with a clear error
        })))
}
