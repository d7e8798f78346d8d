package graft.ext

import graft.SparkSpec

/** Property checks for the BPE trainer over fixed-seed random corpora
  * (the repo's NamesSpec sampling idiom): every emitted merge is a TRUE
  * argmax of the evolving vocabulary state under the declared
  * (count DESC, left, right) order, application preserves content, and
  * the run is deterministic. The checker re-implements pair counting
  * and greedy application independently (index-walk over a test-local
  * vocab state), so a regression in either half of the trainer breaks
  * the agreement.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpora: Seq[Seq[String]] = {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc" // small alphabet forces heavy pair collisions
    def word = (0 until (1 + rnd.nextInt(5)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 12).map(_ => (0 until (3 + rnd.nextInt(10))).map(_ => word))
  }

  private def countPairs(vocab: Seq[(Vector[String], Long)]): Map[(String, String), Long] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
    for ((syms, c) <- vocab; i <- 0 until syms.length - 1) {
      val k = (syms(i), syms(i + 1))
      m.update(k, m.getOrElse(k, 0L) + c)
    }
    m.toMap
  }

  private def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  test("every emitted merge is the true argmax of the evolving state; content preserved") {
    randomCorpora.foreach { words =>
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w, "en", "s", w.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val merges = Bpe.bpeVocab(docs, merges = 5).collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      // independent state: word-type counts from the raw words
      var vocab: Seq[(Vector[String], Long)] = words
        .groupBy(identity).toSeq.map { case (w, ws) =>
          (w.map(_.toString).toVector :+ Bpe.EndOfWord, ws.length.toLong)
        }
      merges.foreach { case (l, r, merged, cnt) =>
        val pairs = countPairs(vocab)
        assert(pairs.nonEmpty, "trainer emitted a merge past exhaustion")
        val best = pairs.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        assert(best._1 == ((l, r)) && best._2 == cnt,
          s"merge ($l,$r,$cnt) is not the argmax ${best} of the evolving state")
        assert(merged == l + r)
        val before = vocab.map { case (s, c) => (s.mkString, c) }
        vocab = vocab.map { case (s, c) => (applyMerge(s, l, r), c) }
        // application rewrites symbol boundaries, never content
        assert(vocab.map { case (s, c) => (s.mkString, c) } == before)
      }
    }
  }

  test("training is deterministic across runs") {
    val words = randomCorpora.head
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w, "en", "s", w.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Bpe.bpeVocab(docs, merges = 5).collect().map(_.toSeq)
    val b = Bpe.bpeVocab(docs, merges = 5).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
