package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel scoring one document under a FROZEN stupid-backoff
  * bigram model (the serving half of `Relevance.bigramLogProb`, which
  * trains and scores the same corpus in one plan). The model arrives
  * as driver-resident lookup tables referenced from generated code —
  * the `BpeApply` merge-table recipe — so apply is ONE narrow
  * codegen'd projection: text read once, no pair explode, no model
  * join, ZERO shuffles. That is the 100 TB posture train-once models
  * earn: the training corpus paid its aggregation when the model was
  * built; every later corpus only streams.
  *
  * Bit-parity contract with the in-plan scorer, clause by clause:
  * tokens are lowercased letter runs (`UTF8String.toLowerCase` — the
  * exact `lower()` kernel — then an ASCII `[a-z]` run scan, equal to
  * `split + filter` on any input); per-pair log-probability is
  * `ln(bcnt/pcnt)` for an in-table bigram else
  * `ln(alpha · vocabCount(w2 | 1) / total)` with the same operand
  * order; pairs accumulate in document order (the batch plan's pairs
  * explode from ONE row and partial-aggregate in iteration order);
  * the mean rounds through [[VectorOps.round4]] — the 4-dp LM-score
  * contract.
  */
object BigramScore {

  /** `[n_tokens, n_bigrams, n_backoff, logprob]` for one document
    * (integer counts exact in double far below 2^53; the caller casts
    * back). Sub-2-token docs score `[n, 0, 0, 0.0]`, matching the
    * batch key's left-join coalesce.
    */
  def score(
      text: UTF8String,
      bigramLp: java.util.HashMap[String, java.lang.Double],
      vocabCnt: java.util.HashMap[String, java.lang.Long],
      alpha: Double,
      total: Long): ArrayData = {
    val s = text.toLowerCase.toString
    val words = new java.util.ArrayList[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      var j = i
      while (j < n && s.charAt(j) >= 'a' && s.charAt(j) <= 'z') j += 1
      if (j > i) { words.add(s.substring(i, j)); i = j } else i += 1
    }
    val nTokens = words.size.toDouble
    if (words.size < 2)
      return new GenericArrayData(Array(nTokens, 0.0, 0.0, 0.0))
    var sum = 0.0
    var backoff = 0L
    var w = 0
    while (w < words.size - 1) {
      val w1 = words.get(w)
      val w2 = words.get(w + 1)
      val lp = bigramLp.get(w1 + " " + w2)
      if (lp != null) sum += lp.doubleValue()
      else {
        val c = vocabCnt.get(w2)
        val cnt = if (c != null) c.longValue() else 1L
        sum += math.log(alpha * cnt.toDouble / total.toDouble)
        backoff += 1
      }
      w += 1
    }
    val nPairs = (words.size - 1).toLong
    new GenericArrayData(Array(
      nTokens, nPairs.toDouble, backoff.toDouble,
      VectorOps.round4(sum / nPairs)))
  }
}

/** `graft_bigram_score(text)`: [[BigramScore.score]] with the frozen
  * model tables injected as codegen reference objects — the whole
  * scorer stays inside one WholeStageCodegen span (the BPE-apply
  * lesson: a reference-object JVM loop, never a literal-expanded
  * expression tree).
  */
case class BigramScoreExpr(
    child: Expression,
    bigramLp: java.util.HashMap[String, java.lang.Double],
    vocabCnt: java.util.HashMap[String, java.lang.Long],
    alpha: Double,
    total: Long) extends UnaryExpression with StringInputCheck {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_bigram_score"

  override protected def nullSafeEval(input: Any): Any =
    BigramScore.score(
      input.asInstanceOf[UTF8String], bigramLp, vocabCnt, alpha, total)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bigramLp", bigramLp, "java.util.HashMap")
    val vRef = ctx.addReferenceObj("vocabCnt", vocabCnt, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramScore.score($c, $bRef, $vRef, $alpha, ${total}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramScoreExpr =
    copy(child = newChild)
}
