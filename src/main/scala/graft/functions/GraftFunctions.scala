package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}

/** Column-API and SQL entry points for the custom expressions. */
object GraftFunctions {

  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(c)))

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

  def hyperplaneSketch(v: Column, dim: Int, planes: Int): Column =
    GraftBridge.column(HyperplaneSketchExpr(GraftBridge.expression(v), dim, planes))

  /** Plan-time integer constant for SQL-facing builders (K, n, dim…). */
  private def litInt(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }

  private val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" -> (es => SimHash64Expr(es.head)),
    "graft_minhash_sig" -> (es =>
      if (es.length >= 2) MinHashSigExpr(es.head, litInt(es(1)))
      else MinHashSigExpr(es.head)),
    "graft_ngram_hashes" -> (es => NGramHashesExpr(es.head, litInt(es(1)))),
    "graft_jaccard_sorted" -> (es => JaccardExpr(es.head, es(1))),
    "graft_cosine_sim" -> (es => CosineSimExpr(es.head, es(1))),
    "graft_hyperplane_sketch" -> (es =>
      HyperplaneSketchExpr(es.head, litInt(es(1)), litInt(es(2)))),
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
