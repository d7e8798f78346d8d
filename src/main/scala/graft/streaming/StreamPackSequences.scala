package graft.streaming

import graft.ext.{Bpe, Corpus}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (document, block) segment of the streaming pack map — the
  * [[graft.ext.Corpus.packSequences]] row plus the shard that owns the
  * block stream.
  */
case class PackedSegment(
    doc_id: Long, shard: Int, block_id: Long, off_in_block: Long, n_tokens: Long)

private[streaming] case class PackCursor(nextOff: Long)

/** Streaming face of [[Corpus.packSequences]] — concat-and-chunk as
  * documents ARRIVE: each shard owns an ever-growing training-block
  * stream; every arriving doc's tokens are appended at the shard's
  * cursor and cut into exact `blockTokens`-token blocks, the cursor
  * persisting across micro-batches in the state store. The face of the
  * last pipeline step before a trainer ingests a live crawl.
  *
  * Frozen-tokenizer posture (the [[StreamPerplexity]] /
  * `classifier_apply` treatment applied to packing): the batch operator
  * trains its merge table on the corpus it packs; a stream cannot
  * retrain per micro-batch without the pack map flapping, so the face
  * takes the TRAINED merge table ([[Bpe.bpeVocab]]'s output, ≤ merges
  * rows — the audited bounded-collect class) and prices every doc under
  * it: per-doc token counts are ONE narrow projection (a higher-order
  * fold applying the codegen'd per-word kernel — no type-table join,
  * the honest per-row streaming cost), computed BEFORE the stateful
  * shuffle, so text never reaches the state store.
  *
  * Batch-equivalence contract, stated precisely: block assignment is a
  * pure fold over (arrival order, token counts). With `shards = 1` and
  * docs arriving in doc_id order — across ANY micro-batch split — the
  * output equals the batch operator's pack map row for row under the
  * same merge table (spec-pinned, including blocks straddling a
  * micro-batch boundary); out-of-order arrival packs in arrival order,
  * the inherent streaming trade ([[StreamSelectBudget]]'s). Sharding:
  * `hash64(doc_id) mod shards` — content-addressed, so a replay lands
  * every doc in the same shard's block stream; each shard's fold is
  * sequential but the shards pack in parallel (the
  * [[StreamSelectBudget.selectStreamSharded]] remedy built in from the
  * start — per-shard block files are what a distributed trainer reads
  * anyway). State per shard: ONE running token offset, never evicted
  * (the block stream's lifetime IS the query's).
  */
object StreamPackSequences {

  /** Segment rows (append stream) for each arriving document under a
    * frozen merge table; zero-token docs occupy no space and emit no
    * rows. Within a micro-batch each shard packs in doc_id order (the
    * batch operator's order); across micro-batches, in arrival order.
    */
  def packStream(
      stream: DataFrame,
      mergeTable: DataFrame,
      blockTokens: Int = Corpus.PackBlockTokens,
      shards: Int = 1): Dataset[PackedSegment] = {
    import stream.sparkSession.implicits._
    require(blockTokens >= 1, s"need a positive block length: $blockTokens")
    require(shards >= 1, s"need at least one shard: $shards")
    val ms = mergeTable.orderBy("merge_rank")
      .select("left", "right").collect()
    val ls = ms.map(_.getString(0))
    val rs = ms.map(_.getString(1))
    val L = blockTokens.toLong
    val toks = aggregate(
      filter(split(lower(col("text")), "[^a-z]+"), w => length(w) > 0),
      lit(0L),
      (acc, w) => acc +
        graft.functions.GraftFunctions.bpeCount(w, Bpe.EndOfWord, ls, rs))
    val counted = stream.select(
      col("doc_id"),
      pmod(graft.functions.GraftFunctions.hash64(col("doc_id").cast("string")),
        lit(shards.toLong)).cast("int").as("shard"),
      toks.as("n_tokens"))
    counted.as[(Long, Int, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[PackCursor, PackedSegment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[PackCursor]) =>
          var off = state.getOption.map(_.nextOff).getOrElse(0L)
          val out = Vector.newBuilder[PackedSegment]
          it.toVector.sortBy(_._1).foreach { case (id, _, c) =>
            if (c > 0) {
              var b = off / L
              val last = (off + c - 1) / L
              while (b <= last) {
                val s = math.max(off, b * L)
                val e = math.min(off + c, (b + 1) * L)
                out += PackedSegment(id, shard, b, s - b * L, e - s)
                b += 1
              }
              off += c
            }
          }
          state.update(PackCursor(off))
          out.result().iterator
      }
  }
}
