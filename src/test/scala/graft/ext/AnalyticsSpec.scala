package graft.ext

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

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
