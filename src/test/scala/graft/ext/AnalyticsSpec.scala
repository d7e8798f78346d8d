package graft.ext

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  test("rollupRevenue: subtotals and grand total are internally consistent") {
    val out = Analytics.rollupRevenue(spark, "/root/testdata/sf0.001").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2), r.getInt(3), r.getDouble(4), r.getLong(5)))
    val detail   = out.filter { case (_, _, gr, gn, _, _) => gr == 0 && gn == 0 }
    val regional = out.filter { case (_, _, gr, gn, _, _) => gr == 0 && gn == 1 }
    val total    = out.filter { case (_, _, gr, gn, _, _) => gr == 1 && gn == 1 }
    assert(total.length == 1 && regional.nonEmpty && detail.nonEmpty)
    // DECIMAL-exact inputs: double equality up to a relative epsilon of
    // the one final cast
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))
    regional.foreach { case (r, _, _, _, rev, n) =>
      val mine = detail.filter(_._1 == r)
      assert(close(mine.map(_._5).sum, rev) && mine.map(_._6).sum == n, s"region $r")
    }
    assert(close(detail.map(_._5).sum, total.head._5))
    assert(detail.map(_._6).sum == total.head._6)
    // subtotal rows carry NULL nation, total row NULL both
    assert(regional.forall(_._2.isEmpty) && total.head._1.isEmpty)
  }

  test("winsorize clips to discrete per-group order statistics") {
    val out = Analytics.winsorize(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getString(1))
    byType.foreach { case (t, rows) =>
      val values = rows.map(_.getDouble(2)).sorted
      val n = values.length
      val loV = values(math.ceil(0.05 * n).toInt - 1)
      val hiV = values(math.ceil(0.95 * n).toInt - 1)
      rows.foreach { r =>
        val v = r.getDouble(2); val c = r.getDouble(3)
        assert(c >= loV && c <= hiV, s"$t: clipped $c outside [$loV,$hiV]")
        if (v >= loV && v <= hiV) assert(c == v)    // in-band values untouched
        if (v < loV) assert(c == loV)
        if (v > hiV) assert(c == hiV)
      }
    }
  }
}
