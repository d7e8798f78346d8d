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

  /** The committed fixture set: every no-oracle key MUST be pinned here,
    * and keys that have since gained a DuckDB oracle (the r7 MinHash/
    * SimHash conversions) KEEP their fixtures as a second, driver-
    * independent regression signal over the sketch kernels.
    */
  private val fixtureKeys: Seq[String] =
    if (Files.exists(goldenDir)) {
      val s = Files.list(goldenDir)
      try s.toArray.toSeq
        .map(_.toString.split('/').last)
        .filter(_.endsWith(".txt"))
        .map(_.stripSuffix(".txt"))
        .sorted
      finally s.close()
    } else Seq.empty

  test("every no-oracle key has a committed fixture; no stale fixtures") {
    if (!regen) {
      val missing = noOracleKeys.filterNot(fixtureKeys.contains)
      assert(missing.isEmpty,
        s"no-oracle keys without a fixture: $missing " +
          "(regen with -Dgraft.golden.regen=true after an intentional change)")
      val stale = fixtureKeys.filterNot(SparkEntry.queries.keySet)
      assert(stale.isEmpty, s"fixtures for undeclared keys: $stale")
    }
  }

  private def sha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Keys the per-key tests (and the manifest) cover: committed fixtures
    * PLUS current no-oracle keys — so regen mode BOOTSTRAPS a fixture for
    * a newly added no-oracle query (iterating fixtureKeys alone could
    * never create one: regen would write nothing and the guard test's
    * advice to regen couldn't help).
    */
  private val coveredKeys: Seq[String] =
    (fixtureKeys ++ noOracleKeys).distinct.sorted.filter(SparkEntry.queries.contains)

  for (key <- coveredKeys) {
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

  /** Regen guard (declared AFTER the per-key tests: ScalaTest runs in
    * declaration order, so in regen mode the manifest is computed from
    * the fixtures AS REGENERATED). `-Dgraft.golden.regen=true` silently
    * rewrites fixtures on ANY behavior change — only safe when the diff
    * is reviewed. The committed MANIFEST pins each fixture's SHA-256, so
    * an accidental regen (or a hand edit) fails loudly here until the
    * manifest is updated in the SAME reviewed commit.
    */
  test("fixture bytes match the committed MANIFEST.sha256") {
    val manifestPath = goldenDir.resolve("MANIFEST.sha256")
    if (regen) {
      val lines = coveredKeys.map { k =>
        s"${sha256(Files.readAllBytes(goldenDir.resolve(s"$k.txt")))}  $k.txt"
      }
      Files.write(manifestPath, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    } else {
      assert(Files.exists(manifestPath),
        s"missing $manifestPath — regen with -Dgraft.golden.regen=true and review")
      val want = new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty)
        .map { l => val Array(h, f) = l.split("  ", 2); (f, h) }.toMap
      val got = fixtureKeys
        .map(k => (s"$k.txt", sha256(Files.readAllBytes(goldenDir.resolve(s"$k.txt"))))).toMap
      assert(got == want,
        s"fixture hashes drifted from MANIFEST.sha256: " +
          s"${(got.toSet diff want.toSet).map(_._1).toSeq.sorted.mkString(", ")} " +
          "— if the change is intentional, regen and commit both together")
    }
  }
}
