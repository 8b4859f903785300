package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass worker behind `graft_word_ids`: split a document on
  * single spaces (empties dropped) and resolve each word against the
  * trained vocabulary — `syms` is the vocabulary ordered by dense id
  * (id = index + 1, exactly [[graft.ops.Tokenize.vocabBuild]]'s
  * rank-order ids), OOV words encode as -1. Returns
  * (n_tok, comma-joined ids). Shares [[BpeSegHelper.symbolIds]]'s
  * per-thread instance-keyed vocab cache.
  */
object WordIdsHelper {

  def encode(text: UTF8String, syms: ArrayData): InternalRow = {
    val s = text.toString
    val ids = BpeSegHelper.symbolIds(syms)
    val sb = new java.lang.StringBuilder(s.length / 2)
    var n = 0L
    var start = 0
    val len = s.length
    while (start <= len) {
      val sp = s.indexOf(' ', start)
      val end = if (sp < 0) len else sp
      if (end > start) {
        val id = ids.get(s.substring(start, end))
        if (n > 0L) sb.append(',')
        sb.append(if (id == null) -1L else id.longValue())
        n += 1L
      }
      start = end + 1
    }
    InternalRow(n, UTF8String.fromString(sb.toString))
  }
}

/** `graft_word_ids(text, vocab)` — the whole-document word-grain encode
  * in ONE native pass: split on single spaces (empties dropped), dense-id
  * resolution against the foldable vocabulary array (id = index + 1,
  * OOV → -1). Returns struct<n_tok: bigint, ids: string>. Same rationale
  * as [[BpeIds]]/[[UnisegIds]]: the legacy shape broadcast-joined the
  * vocabulary against the exploded token stream and then shuffled every
  * (pos, id) struct on doc_id to reassemble documents. NULL text → NULL.
  */
case class WordIds(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        if (right.eval().isInstanceOf[ArrayData]) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-null vocabulary array")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  // nullable fields: match the legacy join form's dumped schema class.
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = true),
    StructField("ids", StringType, nullable = true)))

  override def prettyName: String = "graft_word_ids"

  override def nullSafeEval(text: Any, syms: Any): Any =
    WordIdsHelper.encode(
      text.asInstanceOf[UTF8String], syms.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, vs) =>
      s"${ev.value} = graft.functions.WordIdsHelper.encode($t, $vs);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordIds =
    copy(left = newLeft, right = newRight)
}

object WordIdsExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_word_ids"),
      new ExpressionInfo(classOf[WordIds].getName, "graft_word_ids"),
      (children: Seq[Expression]) => WordIds(children(0), children(1)))
}
