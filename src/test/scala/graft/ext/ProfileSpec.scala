package graft.ext

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("profileTable: nulls, distincts, ranges per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("b"), Some(10)),
      (Some(2L), None, Some(20)),
      (Some(2L), Some("a"), None),
      (None, Some("a"), Some(20))
    ).toDF("id", "s", "v")
    val got = Profile.profileTable(df, Seq("id", "s", "v")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("id", "s", "v")) // sorted
    val byCol = got.map(r => r.getString(0) -> r).toMap
    got.foreach(r => assert(r.getAs[Long]("n_rows") == 4L))
    assert(byCol("id").getAs[Long]("n_nulls") == 1L)
    assert(byCol("id").getAs[Long]("n_distinct") == 2L) // nulls excluded
    assert(byCol("id").getAs[String]("min_value") == "1")
    assert(byCol("id").getAs[String]("max_value") == "2")
    assert(byCol("s").getAs[Long]("n_nulls") == 1L)
    assert(byCol("s").getAs[Long]("n_distinct") == 2L)
    assert(byCol("s").getAs[String]("min_value") == "a")
    assert(byCol("s").getAs[String]("max_value") == "b")
    assert(byCol("v").getAs[Long]("n_nulls") == 1L)
    assert(byCol("v").getAs[Long]("n_distinct") == 2L)
  }

  test("profileTable plans ONE scan of the source") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val plan = Profile.profileTable(df, Seq("id", "s"))
      .queryExecution.executedPlan
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flat)
    }
    val scans = flat(plan).count {
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _: org.apache.spark.sql.execution.FileSourceScanExec => true
      case _ => false
    }
    assert(scans == 1, s"profile must read the source once, found $scans scans:\n$plan")
  }
}
