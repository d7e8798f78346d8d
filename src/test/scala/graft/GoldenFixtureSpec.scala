package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Hard regression signal for the declared queries that have no DuckDB
  * oracle (custom char-loop hash kernels, Lloyd-trained centroids, the
  * multimodal decode stub): each query's sf0.001 output is committed as
  * a canonical text fixture, and any silent change to the kernels fails
  * here even without the driver's oracle gate.
  *
  * Regenerate (after an INTENTIONAL semantic change) with
  * `sbt -Dgraft.golden.regen=true "testOnly graft.GoldenFixtureSpec"`
  * and review the fixture diff like source.
  */
class GoldenFixtureSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val goldenDir =
    Paths.get(sys.props("user.dir"), "src", "test", "resources", "golden")
  private val regen = sys.props.get("graft.golden.regen").contains("true")

  /** Engine-portable canonical form: columns sorted by name, floats at
    * 6 dp (ulp wobble from aggregation merge order must not flip the
    * fixture), arrays rendered element-wise, rows sorted. Mirrors the
    * driver's sort-columns-then-hash compare.
    */
  private def canonical(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    def fmt(v: Any): String = v match {
      case null => "∅"
      case d: Double => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal.stripTrailingZeros.toPlainString
      case f: Float => fmt(f.toDouble)
      case a: scala.collection.Seq[_] => a.map(fmt).mkString("[", ",", "]")
      case other => other.toString
    }
    df.selectExpr(cols: _*).collect().toSeq
      .map(r => cols.indices.map(i => fmt(r.get(i))).mkString("|"))
      .sorted
  }

  private val noOracleKeys =
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted

  test("no-oracle key set matches the committed fixture set") {
    val fixtures =
      if (Files.exists(goldenDir)) {
        val s = Files.list(goldenDir)
        try s.toArray.toSeq
          .map(_.toString.split('/').last.stripSuffix(".txt"))
          .sorted
        finally s.close()
      } else Seq.empty
    if (!regen)
      assert(fixtures == noOracleKeys,
        s"fixture set drifted: fixtures=$fixtures vs no-oracle=$noOracleKeys " +
          "(regen with -Dgraft.golden.regen=true after an intentional change)")
  }

  for (key <- noOracleKeys) {
    test(s"golden: $key") {
      val got = canonical(SparkEntry.queries(key)(spark, sfDir))
      graft.core.CacheScope.releaseAll()
      assert(got.nonEmpty, s"$key returned no rows at sf0.001")
      val path = goldenDir.resolve(s"$key.txt")
      if (regen) {
        Files.createDirectories(goldenDir)
        Files.write(path, got.mkString("\n").getBytes(StandardCharsets.UTF_8))
      } else {
        assert(Files.exists(path),
          s"missing fixture $path — regen with -Dgraft.golden.regen=true")
        val want = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
          .split("\n").toSeq
        assert(got.size == want.size,
          s"$key: row count ${got.size} != fixture ${want.size}")
        val diffs = got.zip(want).zipWithIndex.collect {
          case ((g, w), i) if g != w => s"row $i: got=$g want=$w"
        }
        assert(diffs.isEmpty,
          s"$key drifted from fixture (${diffs.size} rows):\n${diffs.take(5).mkString("\n")}")
      }
    }
  }
}
