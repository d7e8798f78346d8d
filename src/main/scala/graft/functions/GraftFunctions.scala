package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}

/** Column-API and SQL entry points for the custom expressions. */
object GraftFunctions {

  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(c)))

  def hash64(c: Column): Column =
    GraftBridge.column(Hash64Expr(GraftBridge.expression(c)))

  def minhashSig(c: Column, k: Int = Hashing.MinHashK): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(c), k))

  def ngramHashes(c: Column, n: Int): Column =
    GraftBridge.column(NGramHashesExpr(GraftBridge.expression(c), n))

  def jaccardSorted(a: Column, b: Column): Column =
    GraftBridge.column(JaccardExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Cosine over array<double> columns (the projected-space twin). */
  def cosineSimD(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimDExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def hyperplaneSketch(v: Column, dim: Int, planes: Int): Column =
    GraftBridge.column(HyperplaneSketchExpr(GraftBridge.expression(v), dim, planes))

  /** Johnson–Lindenstrauss ±1 sign projection to `kOut` dims. */
  def randomProject(v: Column, kOut: Int): Column =
    GraftBridge.column(RandomProjectExpr(GraftBridge.expression(v), kOut))

  def bandKey(sig: Column, band: Int, r: Int): Column =
    GraftBridge.column(BandKeyExpr(GraftBridge.expression(sig), band, r))

  def winnowFps(c: Column,
      k: Int = Hashing.WinnowK, w: Int = Hashing.WinnowW): Column =
    GraftBridge.column(WinnowFpsExpr(GraftBridge.expression(c), k, w))

  def charGramHashes(c: Column, k: Int): Column =
    GraftBridge.column(CharGramHashesExpr(GraftBridge.expression(c), k))

  def aHash64(c: Column): Column =
    GraftBridge.column(AHash64Expr(GraftBridge.expression(c)))

  def pngAHash64(c: Column): Column =
    GraftBridge.column(PngAHash64Expr(GraftBridge.expression(c)))

  def audioHash64(c: Column): Column =
    GraftBridge.column(AudioHash64Expr(GraftBridge.expression(c)))

  def videoHash64(c: Column): Column =
    GraftBridge.column(VideoHash64Expr(GraftBridge.expression(c)))

  def bigramScore(
      text: Column,
      bigramLp: java.util.HashMap[String, java.lang.Double],
      vocabCnt: java.util.HashMap[String, java.lang.Long],
      alpha: Double,
      total: Long): Column =
    GraftBridge.column(BigramScoreExpr(
      GraftBridge.expression(text), bigramLp, vocabCnt, alpha, total))

  /** BPE symbol count of a word column under a trained merge list
    * (plan-time constant) — `Bpe.bpeEncode`'s per-type kernel.
    */
  def bpeCount(
      c: Column, eow: String, ls: Array[String], rs: Array[String]): Column =
    GraftBridge.column(BpeCountExpr(GraftBridge.expression(c), eow, ls, rs))

  /** BPE symbol sequence of a word column under a trained merge list
    * (plan-time constant) — `Bpe.bpeTokens`'s per-type kernel.
    */
  def bpeSyms(
      c: Column, eow: String, ls: Array[String], rs: Array[String]): Column =
    GraftBridge.column(BpeSymsExpr(GraftBridge.expression(c), eow, ls, rs))

  /** Flattened k-probe Bloom positions per gram hash (builder side). */
  def bloomPositions(grams: Column, k: Int, mBits: Int): Column =
    GraftBridge.column(BloomPositionsExpr(GraftBridge.expression(grams), k, mBits))

  /** Bloom membership probe: any gram possibly in the bitmap? */
  def bloomAny(grams: Column, bits: Array[Long], k: Int, mBits: Int): Column =
    GraftBridge.column(BloomAnyExpr(GraftBridge.expression(grams), bits, k, mBits))

  /** Exact membership probe: any gram hash in the frozen set? */
  def longSetAny(grams: Column, set: java.util.HashSet[java.lang.Long]): Column =
    GraftBridge.column(LongSetAnyExpr(GraftBridge.expression(grams), set))

  /** Plan-time integer constant for SQL-facing builders (K, n, dim…):
    * any foldable integral expression qualifies (`2`, `1+1`, …).
    */
  private def litInt(name: String, e: Expression): Int =
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name expects a constant integer here, got non-constant $e")
    else e.eval() match {
      case i: Int  => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte  => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name expects a constant integer here, got $other")
    }

  /** SQL builder with arity validation: a wrong argument count raises a
    * descriptive error naming the expected signature instead of a raw
    * IndexOutOfBoundsException.
    */
  private def fn(name: String, signature: String, minArgs: Int, maxArgs: Int)(
      build: Seq[Expression] => Expression): (String, Seq[Expression] => Expression) =
    name -> { es =>
      if (es.length < minArgs || es.length > maxArgs)
        throw new IllegalArgumentException(
          s"$name expects $signature (${if (minArgs == maxArgs) s"$minArgs"
            else s"$minArgs to $maxArgs"} argument(s)), got ${es.length}")
      build(es)
    }

  private val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    fn("graft_simhash64", "(text)", 1, 1)(es => SimHash64Expr(es.head)),
    fn("graft_hash64", "(text)", 1, 1)(es => Hash64Expr(es.head)),
    fn("graft_minhash_sig", "(text[, k])", 1, 2)(es =>
      if (es.length == 2) MinHashSigExpr(es.head, litInt("graft_minhash_sig", es(1)))
      else MinHashSigExpr(es.head)),
    fn("graft_ngram_hashes", "(text, n)", 2, 2)(es =>
      NGramHashesExpr(es.head, litInt("graft_ngram_hashes", es(1)))),
    fn("graft_jaccard_sorted", "(a, b)", 2, 2)(es => JaccardExpr(es.head, es(1))),
    fn("graft_cosine_sim", "(a, b)", 2, 2)(es => CosineSimExpr(es.head, es(1))),
    fn("graft_hyperplane_sketch", "(vec, dim, planes)", 3, 3)(es =>
      HyperplaneSketchExpr(es.head,
        litInt("graft_hyperplane_sketch", es(1)),
        litInt("graft_hyperplane_sketch", es(2)))),
    fn("graft_band_key", "(sig, band, r)", 3, 3)(es =>
      BandKeyExpr(es.head,
        litInt("graft_band_key", es(1)),
        litInt("graft_band_key", es(2)))),
    fn("graft_winnow_fps", "(text, k, w)", 3, 3)(es =>
      WinnowFpsExpr(es.head,
        litInt("graft_winnow_fps", es(1)),
        litInt("graft_winnow_fps", es(2)))),
    fn("graft_char_gram_hashes", "(text, k)", 2, 2)(es =>
      CharGramHashesExpr(es.head, litInt("graft_char_gram_hashes", es(1)))),
    fn("graft_random_project", "(vec, k)", 2, 2)(es =>
      RandomProjectExpr(es.head, litInt("graft_random_project", es(1)))),
    fn("graft_ahash64", "(payload)", 1, 1)(es => AHash64Expr(es.head)),
    fn("graft_png_ahash64", "(payload)", 1, 1)(es => PngAHash64Expr(es.head)),
    fn("graft_audiohash64", "(payload)", 1, 1)(es => AudioHash64Expr(es.head)),
    fn("graft_videohash64", "(payload)", 1, 1)(es => VideoHash64Expr(es.head)),
  )

  /** Register the functions for SQL use on an existing session
    * (idempotent). Equivalent to installing [[GraftExtensions]].
    */
  def register(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  private[functions] def extensionFunctions: Seq[(String, Seq[Expression] => Expression)] =
    sqlFunctions
}

/** SparkSessionExtensions installer:
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.extensionFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Expressions", name),
        builder))
    }
}
