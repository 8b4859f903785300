package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** All random-hyperplane LSH band signatures of a vector in ONE native
  * pass: `graft_hplanes(e, bands, fillBits, useBits, seed)` →
  * `array<long>` of length `bands`, where band i's bucket is
  * Σ_{b < useBits} (e·p_{i,b} ≥ 0) · 2^b.
  *
  * The Column-tree formulation this replaces ([[graft.ops.Ann]] rounds
  * 3–7) spelled every plane out as a `typedlit` array literal feeding one
  * `graft_dot` each — bands × bits dot calls × dim-element literals
  * ≈ 8,000 plan nodes PER QUERY, re-analyzed, re-optimized and
  * re-codegen'd on every run. Here the plane matrix lives in a
  * process-wide memo keyed by (bands, fillBits, seed), with the corpus
  * dimension bound at first use (mixed dims fail loudly) — the plan
  * carries five leaf expressions total and one tight bands × bits × dim
  * loop runs per row. Signatures are BIT-IDENTICAL to the Column
  * formulation: planes are drawn from the same `scala.util.Random(seed)`
  * stream in the same `Array.fill(bands, fillBits, dim)` order, and only
  * the first `useBits` of each band's fill width are voted (so an 8-bit
  * operating point of a 16-wide fill reproduces the historical draws
  * exactly). VectorExpressionsSpec asserts equality against the Column
  * build on the real corpus.
  *
  * Null/empty input → NULL signature array (no vector ⇒ no buckets),
  * matching `graft_minhash`'s contract.
  */
object HyperplaneSig {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Array[Array[Array[Double]]])]()

  /** [band][bit][dim], drawn exactly like the historical Ann literals.
    *
    * The matrix is keyed by (bands, fillBits, seed) ONLY and the first
    * vector's dimension BINDS it: a later vector of a different dimension
    * fails loudly instead of silently drawing a fresh, unrelated plane set
    * whose buckets would land in the same band-join key space (a stray
    * 63-dim row in a 64-dim corpus would otherwise collide — or miss its
    * twin — with no error anywhere). Corpora of genuinely different
    * dimensions must use distinct seeds; the pin also caps the memo at one
    * matrix per operating point.
    */
  private def planes(bands: Int, fillBits: Int, seed: Long, dim: Int): Array[Array[Array[Double]]] = {
    val entry = memo.computeIfAbsent(s"$bands:$fillBits:$seed", { _ =>
      val rnd = new scala.util.Random(seed)
      (dim, Array.fill(bands, fillBits, dim)(rnd.nextGaussian()))
    })
    if (entry._1 != dim)
      throw new IllegalStateException(
        s"graft_hplanes(bands=$bands, fillBits=$fillBits, seed=$seed): " +
          s"vector dimension $dim does not match the dimension ${entry._1} this " +
          "plane set was bound to by its first use — mixed-dimension input is " +
          "corrupt (use a distinct seed per corpus dimension)")
    entry._2
  }

  def signatures(arr: ArrayData, bands: Int, fillBits: Int, useBits: Int, seed: Long): ArrayData = {
    val dim = arr.numElements()
    if (dim == 0) return null
    val e = new Array[Double](dim)
    var d = 0
    while (d < dim) { e(d) = arr.getDouble(d); d += 1 }
    val p = planes(bands, fillBits, seed, dim)
    val out = new Array[Long](bands)
    var i = 0
    while (i < bands) {
      var sig = 0L
      var b = 0
      while (b < useBits) {
        val plane = p(i)(b)
        var dot = 0.0
        var k = 0
        while (k < dim) { dot += e(k) * plane(k); k += 1 }
        if (dot >= 0) sig |= 1L << b
        b += 1
      }
      out(i) = sig
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class HyperplaneSignatures(children: Seq[Expression]) extends Expression {

  private def vec: Expression = children.head

  private def litInt(i: Int): Int =
    children(i).eval().asInstanceOf[Number].longValue().toInt

  private lazy val bands = litInt(1)
  private lazy val fillBits = litInt(2)
  private lazy val useBits = litInt(3)
  private lazy val seed = litInt(4).toLong

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 5)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (vector, bands, fillBits, useBits, seed), got ${children.size} args")
    val paramsOk = children.tail.forall { c =>
      val integral = c.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      c.foldable && integral && c.eval() != null
    }
    if (!paramsOk)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName parameters must be non-null foldable integral literals")
    vec.dataType match {
      case ArrayType(DoubleType, _) =>
        if (bands >= 1 && fillBits >= 1 && useBits >= 1 &&
            useBits <= fillBits && useBits <= 63)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: need 1 <= useBits <= fillBits and useBits <= 63, " +
            s"got bands=$bands fillBits=$fillBits useBits=$useBits")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hplanes"

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else HyperplaneSig.signatures(v.asInstanceOf[ArrayData], bands, fillBits, useBits, seed)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = vec.genCode(ctx)
    val sig = ctx.freshName("hpsig")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $sig =
            graft.functions.HyperplaneSig.signatures(
              ${childGen.value}, $bands, $fillBits, $useBits, ${seed}L);
          if ($sig != null) { ${ev.isNull} = false; ${ev.value} = $sig; }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperplaneSignatures =
    copy(children = newChildren)
}

object HyperplaneExpression {
  val entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_hplanes"),
      new ExpressionInfo(classOf[HyperplaneSignatures].getName, "graft_hplanes"),
      (children: Seq[Expression]) => HyperplaneSignatures(children))
}
