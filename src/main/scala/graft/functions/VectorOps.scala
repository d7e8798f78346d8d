package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** JVM vector kernels behind the custom expressions ([[CosineSimExpr]],
  * [[HyperplaneSketchExpr]]): tight loops over float arrays instead of
  * interpreted zip_with/aggregate chains — the difference between ~µs
  * and ~ms per pair on 64-dim embeddings.
  */
object VectorOps {

  /** Round-half-up at 6 dp — the JVM twin of Spark's `round(col, 6)`
    * (BigDecimal HALF_UP). THE portable-rounding contract every
    * driver-side 6-dp value must go through (streaming JVM argmins,
    * PQ ADC tables): one definition, so a rounding-mode change cannot
    * leave a second copy stale.
    */
  def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Round-half-up at 4 dp — the LM-score twin of [[round6]] (the
    * 4-dp `round(avg(ln …))` contract of the LM/DSIR score family),
    * for JVM kernels that must reproduce those scores off-plan
    * ([[BigramScore]]).
    */
  def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** [[Hashing.bandKey]] over a catalyst long-array — the SAME band-key
    * function for batch plans and streaming state keys, so their bucket
    * collision sets are identical (not merely distribution-alike).
    */
  def bandKey(sig: ArrayData, band: Int, r: Int): Long = {
    var h = 0xcbf29ce484222325L ^ band
    var i = band * r
    val end = i + r
    while (i < end) {
      h = (h ^ sig.getLong(i)) * 0x100000001b3L
      h ^= h >>> 29
      i += 1
    }
    h
  }

  /** [[cosine]] over plain float arrays — IDENTICAL accumulation order
    * to the ArrayData overload, so streaming-state comparisons and the
    * codegen'd batch expression compute bit-equal doubles.
    */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** [[cosine]] over array<double> inputs (the projected-space twin —
    * JL outputs are doubles): IDENTICAL ascending-index accumulation,
    * so it computes bit-equal results to the interpreted
    * zip_with/aggregate chain it replaces in the hot path.
    */
  def cosineDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  // --------------------------------------------- JL random projection

  /** Deterministic ±1/√kOut sign matrix for [[randomProject]], cached
    * per (dim, kOut): sign(j, i) = bit 0 of `Hashing.hash64("rp:j:i")`
    * — hash-derived, so there is no RNG state to ship and any engine
    * with the hash64 replica (ExtQueries.hash64Ctes) regenerates the
    * SAME matrix from the same key strings.
    */
  private val rpWeightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def rpWeights(dim: Int, kOut: Int): Array[Array[Double]] =
    rpWeightCache.computeIfAbsent((dim, kOut), { case (d, ko) =>
      val s = 1.0 / math.sqrt(ko.toDouble)
      Array.tabulate(ko, d)((j, i) =>
        if ((Hashing.hash64(s"rp:$j:$i") & 1L) == 1L) s else -s)
    })

  /** Johnson–Lindenstrauss SIGN random projection (Achlioptas 2003's
    * database-friendly ±1 variant, JCSS 66(4)): out_j = Σ_i v_i ·
    * (±1/√kOut), with every term rounded to 6 dp ([[round6]]) and
    * accumulated EXACTLY in integer micro-units — order-independent by
    * construction, so a decimal SUM of the same 6-dp parts in any
    * engine reproduces each output bit-for-bit (the PQ-ADC contract
    * applied to projection).
    */
  def randomProject(v: ArrayData, kOut: Int): Array[Double] = {
    val dim = v.numElements()
    val w = rpWeights(dim, kOut)
    val s = 1.0 / math.sqrt(kOut.toDouble)
    // ONE exact rounding per input element, not per (element, output):
    // HALF_UP is sign-symmetric (round6(-x) == -round6(x) exactly), so
    // the ±s terms are ± one shared rounded magnitude — 16× fewer
    // BigDecimal ops with bit-identical results (spec replays the
    // per-term form and must agree)
    val rmicros = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      rmicros(i) = math.round(round6(v.getFloat(i).toDouble * s) * 1e6)
      i += 1
    }
    val out = new Array[Double](kOut)
    var j = 0
    while (j < kOut) {
      val wj = w(j)
      var micros = 0L
      var i2 = 0
      while (i2 < dim) {
        micros += (if (wj(i2) > 0) rmicros(i2) else -rmicros(i2))
        i2 += 1
      }
      out(j) = round6(micros / 1e6)
      j += 1
    }
    out
  }

  /** Seeded gaussian hyperplane matrices, cached per (dim, planes). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def planesFor(dim: Int, planes: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, planes), { case (d, p) =>
      val rnd = new scala.util.Random(11)
      Array.fill(p)(Array.fill(d)(rnd.nextGaussian()))
    })

  /** Sign-bit sketch of the seeded hyperplanes packed into a Long. */
  def sketch(v: ArrayData, dim: Int, nPlanes: Int): Long = {
    val ps = planesFor(dim, nPlanes)
    val n = math.min(v.numElements(), dim)
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      val plane = ps(p)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i) * plane(i); i += 1 }
      if (dot > 0.0) out |= (1L << p)
      p += 1
    }
    out
  }
}
