package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** prodGt (the aHash64 bit decision) against BigInteger ground truth,
  * across magnitudes that overflow a signed-64 product.
  */
class HashingPropSpec extends AnyFunSuite {
  test("prodGt == BigInteger compare across overflow magnitudes") {
    val rnd = new scala.util.Random(11)
    def big = math.abs(rnd.nextLong()) match { case Long.MinValue => 0L; case v => v }
    val interesting = Seq(0L, 1L, 2L, 255L, Int.MaxValue.toLong,
      (1L << 31) - 1, 1L << 32, Long.MaxValue / 255, Long.MaxValue)
    val samples =
      (for (a <- interesting; b <- interesting) yield (a, b, b, a)) ++
        Seq.fill(2000)((big % (1L << 40), big % (1L << 33), big % (1L << 40), big % (1L << 33))) ++
        Seq.fill(2000)((big, big % 256L, big, big % 256L))
    samples.foreach { case (a, b, c, d) =>
      val expected = java.math.BigInteger.valueOf(a).multiply(java.math.BigInteger.valueOf(b))
        .compareTo(java.math.BigInteger.valueOf(c).multiply(java.math.BigInteger.valueOf(d))) > 0
      assert(Hashing.prodGt(a, b, c, d) == expected,
        s"prodGt($a,$b,$c,$d)")
    }
  }
}
