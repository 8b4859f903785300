package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Map-side sketch signatures as native codegen expressions.
  *
  * A document is ONE row, so its SimHash/MinHash signature is a per-row
  * function of its token array — there is no reason to explode tokens and
  * shuffle them into a 64-SUM / 32-MIN aggregation (the round-1..3 shape,
  * kept in [[graft.ops.Dedup]] as the `*SignaturesAgg` differential
  * references). These expressions compute the identical signatures in one
  * whole-stage-codegen'd pass over the columnar token ArrayData: the
  * explode, the partial/final aggregate, and the signature shuffle all
  * disappear. At 100 TB that turns signature computation from a
  * (doc_id, token)-keyed shuffle of ~100× the document count into a pure
  * map stage; the only remaining shuffle in the dedup pipelines is the
  * band-key candidate join, which is irreducible (it IS the algorithm).
  *
  * Hash compatibility: tokens are hashed with the same
  * `XxHash64Function.hash(_, StringType, 42)` that the SQL `xxhash64()`
  * function applies, so signatures are bit-identical to the aggregate
  * formulation (DedupSpec asserts equality on the real corpus).
  */
object SketchHash {

  /** Mersenne prime 2^31 − 1; hash values and coefficients stay below 2^31
    * so a·h + b < 2^62 never overflows a Long.
    */
  val Prime = 2147483647L
  val NumPerms = 32

  /** Deterministic permutation coefficients (fixed seed — no runtime RNG);
    * the single source of truth shared with [[graft.ops.Dedup]].
    *
    * `absSafe` fences the one value `math.abs` cannot negate
    * (Long.MinValue → itself, which would yield a non-positive
    * coefficient). Mapping it to Long.MaxValue keeps every other draw —
    * and therefore every historical signature — bit-identical.
    */
  private def absSafe(x: Long): Long =
    if (x == Long.MinValue) Long.MaxValue else math.abs(x)

  val (coeffA, coeffB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val ab = Array.fill(NumPerms)(
      ((absSafe(rnd.nextLong()) % (Prime - 1)) + 1, absSafe(rnd.nextLong()) % Prime))
    (ab.map(_._1), ab.map(_._2))
  }

  private val XxSeed = 42L // xxhash64()'s default seed

  /** 64-bit SimHash of a token multiset: per-token xxhash64 votes ±1 per
    * bit position, bit set iff the vote sum is positive. Null elements are
    * skipped (cannot occur in split()-built arrays). Returns null for an
    * empty/all-null array (mirroring [[minhash]]): a contentless document
    * has NO signature — a real-looking 0L would band-collide every empty
    * doc with each other and with any signature whose band happens to be 0.
    */
  def simhash(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    var any = false
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, XxSeed)
        var k = 0
        while (k < 64) {
          votes(k) += (((h >>> k) & 1L).toInt << 1) - 1 // +1 if bit set else −1
          k += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(sig)
  }

  /** 32-slot MinHash signature of a shingle set: slot j = min over
    * shingles of (a_j·pmod(xxhash64(s), P) + b_j) mod P. Returns null for
    * an empty array (a doc with no shingles has no signature — the
    * aggregate path drops it, and callers filter the same way).
    */
  def minhash(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    var any = false
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val xh = XxHash64Function.hash(arr.getUTF8String(i), StringType, XxSeed)
        val h = ((xh % Prime) + Prime) % Prime // pmod
        var j = 0
        while (j < NumPerms) {
          val v = (h * coeffA(j) + coeffB(j)) % Prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}

private[functions] trait TokenArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
}

/** `graft_simhash(tokens)` — 64-bit SimHash signature of a token array;
  * NULL for an empty/all-null input (no tokens ⇒ no signature, matching
  * `graft_minhash`).
  */
case class SimHashSignature(child: Expression)
    extends UnaryExpression with TokenArrayInput {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SketchHash.simhash(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      s"""
         |java.lang.Long $sig = graft.functions.SketchHash.simhash($c);
         |if ($sig == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $sig.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

/** `graft_minhash(shingles)` — 32-slot MinHash signature array; NULL for
  * an empty/all-null input (no shingles ⇒ no signature).
  */
case class MinHashSignature(child: Expression)
    extends UnaryExpression with TokenArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    SketchHash.minhash(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.SketchHash.minhash($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object SketchExpressions {
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSignature].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashSignature(children.head)),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSignature(children.head)))
}
