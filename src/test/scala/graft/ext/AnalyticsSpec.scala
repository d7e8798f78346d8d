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

  test("eventPivot: per-type columns partition the event count, days complete") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.eventPivot(spark, dir).collect()
    assert(out.nonEmpty)
    val typeCols = (Analytics.EventTypes :+ Analytics.PivotOther).indices.map(_ + 1)
    val pivotTotal = out.map(r => typeCols.map(r.getLong).sum).sum
    val nEvents = graft.io.Sources.table(spark, dir, "events").count()
    assert(pivotTotal == nEvents, "pivot cells must partition the event count")
    // explicit-values pivot: no day lost, no negative or null cell; the
    // drift bucket exists and is empty on the clean synthetic feed
    assert(out.forall(r => typeCols.forall(i => r.getLong(i) >= 0L)))
    assert(out.map(_.getLong(typeCols.last)).sum == 0L,
      "n_other must be 0 on a vocabulary-clean feed")
    val days = out.map(_.getString(0))
    assert(days.distinct.length == days.length && days.sorted.sameElements(days))
  }

  test("dormantCustomers: exact complement of customers holding a big order") {
    val dir = "/root/testdata/sf0.001"
    val minPrice = 400000.0
    val dormant = Analytics.dormantCustomers(spark, dir, minPrice)
      .collect().map(_.getLong(0)).toSet
    val orders = graft.io.Sources.table(spark, dir, "orders").collect()
    val active = orders.filter(_.getAs[Double]("o_totalprice") > minPrice)
      .map(_.getAs[Long]("o_custkey")).toSet
    val all = graft.io.Sources.table(spark, dir, "customer")
      .collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(dormant == all -- active)
    assert(dormant.nonEmpty && dormant != all,
      "threshold must leave both join paths populated")
  }

  test("revenueTrend: trailing sum and MoM delta recompute from the rows") {
    val out = Analytics.revenueTrend(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length > 3)
    assert(out.map(_._1).sorted.sameElements(out.map(_._1)))
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))
    out.zipWithIndex.foreach { case ((_, rev, _, trail, delta), i) =>
      val want = out.slice(math.max(0, i - 2), i + 1).map(_._2).sum
      assert(close(trail, want), s"row $i trailing")
      val wantDelta = if (i == 0) 0.0 else rev - out(i - 1)._2
      assert(close(delta, wantDelta), s"row $i delta")
    }
  }

  test("revenueForecast: recomputes exactly from the filtered rows") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.revenueForecast(spark, dir).collect()
    assert(out.length == 1)
    val rows = graft.io.Sources.table(spark, dir, "lineitem")
      .selectExpr("CAST(l_shipdate AS STRING) AS d", "l_discount", "l_quantity",
        "l_extendedprice").collect()
      .filter { r =>
        val d = r.getString(0)
        d >= "1995-01-01" && d < "1996-01-01" &&
          r.getDouble(1) >= 0.05 && r.getDouble(1) <= 0.07 && r.getDouble(2) < 24.0
      }
    assert(out.head.getLong(1) == rows.length && rows.nonEmpty)
    val want = rows.map(r =>
      BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(out.head.getDouble(0) - want.toDouble) < 1e-9)
  }

  test("brandLeaders: per-brand top-3 recomputes; WindowGroupLimit in the plan") {
    val dir = "/root/testdata/sf0.001"
    val df = Analytics.brandLeaders(spark, dir)
    val out = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (brand, rows) =>
      assert(rows.length <= 3)
      assert(rows.sortBy(_._2).map(_._2).sameElements(1 to rows.length))
      // revenue non-increasing within the brand
      val revs = rows.sortBy(_._2).map(_._4)
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b - 1e-9 }, s"$brand")
    }
    // the constant rank bound must reach the window as a group limit —
    // the map-side pruning that keeps per-group top-k scale-safe
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "constant rank bound did not trigger WindowGroupLimit pushdown")
  }

  test("userRetention: recomputes from the raw (day,user) sets") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.userRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val daily = graft.io.Sources.table(spark, dir, "events")
      .selectExpr("ts DIV 86400000000 AS d", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byDay = daily.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    out.foreach { case (day, nUsers, nRet, ratio) =>
      val users = byDay(day)
      assert(nUsers == users.size)
      val want = byDay.get(day - 1).map(prev => users.count(prev.contains)).getOrElse(0)
      assert(nRet == want, s"day $day")
      assert(math.abs(ratio - (want.toDouble / users.size)) < 1e-4 + 1e-9)
    }
    assert(out.map(_._1).toSet == byDay.keySet, "every active day reported")
  }

  test("eventFunnel: strict-order counts recompute from per-user first events") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.eventFunnel(spark, dir).collect().head
    val events = graft.io.Sources.table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    def firstOf(rows: Array[(Long, String, Long)], t: String): Option[Long] = {
      val ts = rows.filter(_._2 == t).map(_._3)
      if (ts.isEmpty) None else Some(ts.min)
    }
    val funnel = byUser.values.map { rows =>
      val s = firstOf(rows, "signup"); val v = firstOf(rows, "view")
      val p = firstOf(rows, "purchase")
      val sv = s.isDefined && v.isDefined && s.get < v.get
      (s.isDefined, sv, sv && p.isDefined && v.get < p.get)
    }
    assert(out.getLong(0) == byUser.size)
    assert(out.getLong(1) == funnel.count(_._1))
    assert(out.getLong(2) == funnel.count(_._2))
    assert(out.getLong(3) == funnel.count(_._3))
    assert(out.getLong(1) > 0 && out.getLong(3) < out.getLong(1),
      "funnel stages must discriminate on this data")
  }

  test("tradeFlows: pairs partition the non-domestic lineitems, no diagonal") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.tradeFlows(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.forall { case (c, s, _, _) => c != s }, "domestic trade must be excluded")
    assert(out.map(p => (p._1, p._2)).distinct.length == out.length)
    // totals: flows + domestic items = every lineitem (each resolves to
    // exactly one nation pair through the two dim chains)
    import org.apache.spark.sql.functions.col
    val l = graft.io.Sources.table(spark, dir, "lineitem")
    val o = graft.io.Sources.table(spark, dir, "orders")
    val c = graft.io.Sources.table(spark, dir, "customer")
    val s = graft.io.Sources.table(spark, dir, "supplier")
    val domestic = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s.withColumnRenamed("s_nationkey", "_sn"),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("_sn"))
      .count()
    assert(out.map(_._4).sum + domestic == l.count())
  }

  test("dailyAnomaly: z-scores recompute from exact sums; per-type mean z ~ 0") {
    val out = Analytics.dailyAnomaly(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (t, rows) =>
      val ns = rows.map(_._3.toDouble)
      val mean = ns.sum / ns.length
      val varr = ns.map(x => x * x).sum / ns.length - mean * mean
      rows.foreach { case (d, _, n, z) =>
        val want = if (varr > 0) (n - mean) / math.sqrt(varr) else 0.0
        assert(math.abs(z - want) < 1e-4 + 1e-9, s"$t day $d")
      }
      // z-scores of a population against its own stats average to ~0
      assert(math.abs(rows.map(_._4).sum / rows.length) < 1e-3, t)
    }
  }

  test("smallLotRevenue: recomputes from per-part averages driver-side") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.smallLotRevenue(spark, dir).collect().head
    val rows = graft.io.Sources.table(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avg = rows.groupBy(_._1).view.mapValues { ls =>
      val s = ls.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      math.rint(s.toDouble / ls.length * 1e6) / 1e6
    }.toMap
    val small = rows.filter { case (pk, q, _) => q < avg(pk) * 0.2 }
    assert(out.getLong(1) == small.length && small.nonEmpty)
    val want = small.map(r =>
      BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(out.getDouble(0) - want.toDouble) < 1e-9)
    // both join paths must carry weight: some lineitems survive, most don't
    assert(small.length < rows.length)
  }

  test("eventTransitions: adjacency recomputes from per-user timelines") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val events = graft.io.Sources.table(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = events.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out == want)
    // transitions = events - users (each timeline drops one terminator)
    val nUsers = events.map(_._1).distinct.length
    assert(out.values.sum == events.length - nUsers)
  }

  test("priorityFulfillment: EXISTS semantics recompute; no duplicate inflation") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.priorityFulfillment(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bulkOrders = graft.io.Sources.table(spark, dir, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 45.0)
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    val want = graft.io.Sources.table(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority").collect()
      .filter(r => bulkOrders.contains(r.getLong(0)))
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(out == want)
    // semi-join, not inner: an order with many bulk lines counts once
    assert(out.values.sum == want.values.sum && out.values.sum < bulkOrders.size ||
      out.values.sum == bulkOrders.size)
  }

  test("customerSegments: RFM recomputes; bins consistent with the row's own numbers") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.customerSegments(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))
    assert(out.nonEmpty)
    out.foreach { case (ck, rec, n, spend, seg) =>
      assert(rec >= 0 && n > 0 && spend > 0)
      val wantSeg = (rec <= 365, spend >= 1500000.0) match {
        case (true, true) => "active_big"
        case (true, false) => "active"
        case (false, true) => "lapsed_big"
        case (false, false) => "lapsed"
      }
      assert(seg == wantSeg, s"cust $ck")
    }
    // the reference date is the corpus max: someone has recency 0
    assert(out.exists(_._2 == 0L))
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

  test("joinSkewReport: per-key products, one-sided keys at zero, top-N order") {
    import spark.implicits._
    // left: key 1×3, 2×2, 3×1; right: key 1×4, 2×1, 9×5 (right-only)
    val left = Seq(1, 1, 1, 2, 2, 3).map(k => (k.toLong, "x"))
      .toDF("k", "payload")
    val right = (Seq.fill(4)(1) ++ Seq(2) ++ Seq.fill(5)(9)).map(k => (k.toLong, "y"))
      .toDF("k", "payload")
    val out = Analytics.joinSkewReport(left, right, "k", "k", topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // products: 1→12, 2→2, 3→0 (left-only), 9→0 (right-only); zero ties
    // break by key ascending — the cut order is total
    assert(out.toSeq == Seq(
      (1L, 3L, 4L, 12L), (2L, 2L, 1L, 2L), (3L, 1L, 0L, 0L), (9L, 0L, 5L, 0L)))
    // the report is the PRODUCT of two aggregates — row counts, never a
    // join of the fact tables themselves
    assert(Analytics.joinSkewReport(left, right, "k", "k", topN = 2)
      .collect().length == 2)
  }
}
