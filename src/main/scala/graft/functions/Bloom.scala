package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic Bloom-filter kernels for gram-level decontamination.
  *
  * The filter is EXACTLY reproducible (no RNG, no sessionized seed):
  * probe `i` of gram hash `g` is a splitmix64 finalizer over
  * `g + (i+1)·φ64` masked onto a power-of-two bit space — the same
  * avalanche stage [[Hashing.hash64]] ends with, so positions inherit
  * its dispersion. Determinism is load-bearing twice over: the bitmap
  * is rebuilt identically on every executor and every re-run (content-
  * addressed, like every graft sketch), and a FALSE POSITIVE is
  * harmless by construction because the bloom only PRUNES the exact
  * confirm join — it never decides membership.
  */
object BloomOps {

  private final val Golden = 0x9E3779B97F4A7C15L

  /** Probe `i`'s bit position for gram hash `g`; `mBits` must be a
    * power of two (masked, not mod — no division, no negative wrap).
    */
  def bloomPos(g: Long, i: Int, mBits: Int): Int = {
    var z = g + (i + 1).toLong * Golden
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z & (mBits - 1)).toInt
  }

  /** All `k` probe positions of every gram, flattened (builder side). */
  def positions(grams: ArrayData, k: Int, mBits: Int): ArrayData = {
    val n = grams.numElements()
    val out = new Array[Long](n * k)
    var i = 0
    while (i < n) {
      val g = grams.getLong(i)
      var j = 0
      while (j < k) {
        out(i * k + j) = bloomPos(g, j, mBits).toLong
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** true iff ANY gram hash is in the exact set — the confirm half of
    * the streaming face, where the bench gram-hash set is a driver
    * artifact (the bounded-model-object class, like the bigram LM
    * tables) instead of a join side. Membership on the 64-bit hashes
    * is bit-equivalent to the batch confirm JOIN, which equi-joins the
    * same hashes.
    */
  def anyInSet(grams: ArrayData, set: java.util.HashSet[java.lang.Long]): Boolean = {
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      if (set.contains(grams.getLong(i))) return true
      i += 1
    }
    false
  }

  /** true iff ANY gram has all `k` probe bits set in `bits` (probe
    * side): the doc is SUSPICIOUS and must go through the exact
    * confirm join. A clean verdict is definitive — Bloom filters have
    * no false negatives.
    */
  def anyHit(grams: ArrayData, bits: Array[Long], k: Int, mBits: Int): Boolean = {
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val g = grams.getLong(i)
      var j = 0
      var all = true
      while (all && j < k) {
        val p = bloomPos(g, j, mBits)
        if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) all = false
        j += 1
      }
      if (all) return true
      i += 1
    }
    false
  }
}

/** Shared input guard: both bloom expressions consume the
  * `array<bigint>` gram-hash arrays [[NGramHashesExpr]] produces.
  */
trait LongArrayInputCheck { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> gram hashes, got ${other.catalogString}")
  }
}

/** `bloom_positions(grams)`: flattened k probe positions per gram —
  * the builder side of the bitmap (positions → bit-words → one
  * bounded OR-aggregate).
  */
case class BloomPositionsExpr(child: Expression, k: Int, mBits: Int)
    extends UnaryExpression with LongArrayInputCheck {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_positions"

  override protected def nullSafeEval(input: Any): Any =
    BloomOps.positions(input.asInstanceOf[ArrayData], k, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomOps.positions($c, $k, $mBits)")

  override protected def withNewChildInternal(newChild: Expression): BloomPositionsExpr =
    copy(child = newChild)
}

/** `bloom_any(grams)`: true iff any gram might be in the bench set —
  * the probe side. The bitmap rides into generated code as a
  * reference object (the BpeApply/BigramScore recipe): one JVM loop
  * per row inside the surrounding WholeStageCodegen span, never a
  * literal-expanded tree.
  */
case class BloomAnyExpr(child: Expression, bits: Array[Long], k: Int, mBits: Int)
    extends UnaryExpression with LongArrayInputCheck {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_any"

  // CONTENT equality (ADVICE r12 #2): the generated case-class equals
  // compares the Array[Long] by reference, so two semantically
  // identical probes never compare equal — blocking subexpression
  // elimination and plan canonicalization. The fingerprint is computed
  // once per instance; equals short-circuits on it before the O(n)
  // array compare. The payload must not be mutated after plan
  // construction (it is shared across copy(), as with every
  // plan-constant reference object).
  private lazy val bitsFp: Int = java.util.Arrays.hashCode(bits)

  override def equals(other: Any): Boolean = other match {
    case b: BloomAnyExpr =>
      k == b.k && mBits == b.mBits && child == b.child &&
        bitsFp == b.bitsFp && java.util.Arrays.equals(bits, b.bits)
    case _ => false
  }

  override def hashCode(): Int =
    ((bitsFp * 31 + k) * 31 + mBits) * 31 + child.hashCode()

  override protected def nullSafeEval(input: Any): Any =
    BloomOps.anyHit(input.asInstanceOf[ArrayData], bits, k, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomOps.anyHit($c, $bitsRef, $k, $mBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyExpr =
    copy(child = newChild)
}

/** `long_set_any(grams)`: exact gram-hash membership against a frozen
  * set riding in as a reference object — the streaming confirm stage.
  */
case class LongSetAnyExpr(child: Expression, set: java.util.HashSet[java.lang.Long])
    extends UnaryExpression with LongArrayInputCheck {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_long_set_any"

  // HashSet equality IS content-based, but its hashCode is O(n) per
  // call — and canonicalization hashes expressions repeatedly. Compute
  // the set fingerprint once per instance and short-circuit equals on
  // it (ADVICE r12 #2). The set must not be mutated after plan
  // construction (shared across copy()).
  private lazy val setFp: Int = set.hashCode()

  override def equals(other: Any): Boolean = other match {
    case l: LongSetAnyExpr =>
      child == l.child && setFp == l.setFp && set.equals(l.set)
    case _ => false
  }

  override def hashCode(): Int = setFp * 31 + child.hashCode()

  override protected def nullSafeEval(input: Any): Any =
    BloomOps.anyInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("gramSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomOps.anyInSet($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LongSetAnyExpr =
    copy(child = newChild)
}
