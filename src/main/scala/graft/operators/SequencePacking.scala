package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Fixed-token-budget sequence packing — the operator an LLM training-data
  * pipeline runs LAST: documents are packed greedily (next-fit) into
  * training sequences of at most `capacity` tokens.
  *
  * Packing an ordered stream is inherently sequential, so the scalable
  * unit is the (source, shard) group with shard = doc_id / shardDocs —
  * the same move production pipelines make (pack per input file/shard).
  * Sequences never cross shards, which makes the assignment deterministic
  * and embarrassingly parallel: whatever the cluster size, each group
  * packs independently in one O(docs-in-shard) pass. The physical plan is
  * ONE range exchange (equal keys land in one partition) + in-partition
  * sort + a streaming per-partition pass; the per-sequence rollup behind
  * it is a partial-agg-friendly groupBy. At 100 TB, `shardDocs` bounds the
  * sequential unit and the range exchange is the only data movement.
  *
  * Next-fit semantics, mirrored exactly by the recursive oracle: a doc
  * that does not fit starts a new sequence; a doc larger than `capacity`
  * alone occupies one overflowing sequence of its own (real pipelines
  * truncate such docs upstream; the packer must still terminate on them).
  */
object SequencePacking {

  /** Input row for the packer: one document's token count, keyed by its
    * deterministic shard. */
  final case class PackIn(source: String, shard: Long, doc_id: Long, n_tok: Long)

  /** Output row: the input plus the assigned sequence id (dense from 0
    * within each (source, shard) group, in doc_id order). */
  final case class PackOut(source: String, shard: Long, doc_id: Long, n_tok: Long, seq_id: Long)

  /** Assign every document to a training sequence. `docs` needs columns
    * doc_id (castable to long), source, and n_tok (long). */
  def packDocs(docs: DataFrame, capacity: Long, shardDocs: Long): Dataset[PackOut] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shardDocs > 0, s"shardDocs must be positive, got $shardDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    // integer `div`, NOT `/`: Spark's `/` divides through double, which
    // loses exactness for ids above 2^53 — a real id space at 100 TB.
    // Non-negative ids make long division == floor, so the key is exact.
    val base = docs.select(
      col("source"),
      expr(s"cast(doc_id as bigint) div ${shardDocs}L").as("shard"),
      col("doc_id").cast("long").as("doc_id"),
      col("n_tok").cast("long").as("n_tok")).as[PackIn]
    base
      .repartitionByRange(col("source"), col("shard"))
      .sortWithinPartitions(col("source"), col("shard"), col("doc_id"))
      .mapPartitions { it =>
        // one running (seq, fill) state, reset at every group boundary;
        // the range partitioner sends equal (source, shard) keys to one
        // partition, so a group is never split across partitions
        var curSrc: String = null
        var curShard = 0L
        var seq = 0L
        var fill = 0L
        var started = false
        it.map { r =>
          if (!started || r.source != curSrc || r.shard != curShard) {
            curSrc = r.source; curShard = r.shard
            seq = 0L; fill = r.n_tok; started = true
          } else if (fill + r.n_tok > capacity) {
            seq += 1; fill = r.n_tok
          } else {
            fill += r.n_tok
          }
          PackOut(r.source, r.shard, r.doc_id, r.n_tok, seq)
        }
      }
  }

  /** Per-sequence rollup: (source, shard, seq_id) -> n_docs, seq_tok. */
  def packedSequences(docs: DataFrame, capacity: Long, shardDocs: Long): DataFrame =
    packDocs(docs, capacity, shardDocs).toDF()
      .groupBy(col("source"), col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tok"))

  /** Input row for the CONTENT packer: the document's token ids ride along
    * (n_tok == toks.length by construction). */
  final case class PackInC(source: String, shard: Long, doc_id: Long, toks: Array[Long])

  /** One materialized training sequence — the artifact a trainer consumes:
    * the concatenated token ids of its documents in doc_id order, plus the
    * document boundaries (`doc_offsets(i)` = start of `doc_ids(i)` within
    * `tokens`; 0-based). */
  final case class PackSeq(source: String, shard: Long, seq_id: Long,
      n_docs: Long, seq_tok: Long, doc_ids: Array[Long], doc_offsets: Array[Long],
      tokens: Array[Long])

  /** Materialize packed sequence CONTENT under the SAME next-fit recurrence
    * as [[packDocs]] (value-equivalence asserted by PackingSpec): `docs`
    * needs source, doc_id (long), and `toks: array<bigint>` token ids.
    * Physical shape is identical to the assignment pass — ONE range
    * exchange + in-partition sort + a streaming per-partition pass that
    * emits one row per SEQUENCE (buffering at most one sequence — at most
    * `capacity` tokens, or one oversized doc — never a whole shard). */
  def packSequenceContent(docs: DataFrame, capacity: Long, shardDocs: Long): Dataset[PackSeq] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shardDocs > 0, s"shardDocs must be positive, got $shardDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      col("source"),
      expr(s"cast(doc_id as bigint) div ${shardDocs}L").as("shard"),
      col("doc_id").cast("long").as("doc_id"),
      col("toks").cast("array<bigint>").as("toks")).as[PackInC]
    base
      .repartitionByRange(col("source"), col("shard"))
      .sortWithinPartitions(col("source"), col("shard"), col("doc_id"))
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[PackSeq] {
          // seq ids are dense from 0 within each (source, shard) group;
          // the group state survives across emitted sequences
          private var curSrc: String = null
          private var curShard = 0L
          private var nextSeq = 0L
          private var started = false
          override def hasNext: Boolean = in.hasNext
          override def next(): PackSeq = {
            val first = in.next()
            if (!started || first.source != curSrc || first.shard != curShard) {
              curSrc = first.source; curShard = first.shard
              nextSeq = 0L; started = true
            }
            val ids = scala.collection.mutable.ArrayBuffer(first.doc_id)
            val offs = scala.collection.mutable.ArrayBuffer(0L)
            val bufs = scala.collection.mutable.ArrayBuffer(first.toks)
            var fill = first.toks.length.toLong
            while (in.hasNext && in.head.source == curSrc && in.head.shard == curShard &&
                fill + in.head.toks.length <= capacity) {
              val r = in.next()
              ids += r.doc_id; offs += fill; bufs += r.toks
              fill += r.toks.length
            }
            require(fill <= Int.MaxValue,
              s"packed sequence of $fill tokens exceeds array addressing")
            val tokens = new Array[Long](fill.toInt)
            var pos = 0
            bufs.foreach { b => System.arraycopy(b, 0, tokens, pos, b.length); pos += b.length }
            val out = PackSeq(curSrc, curShard, nextSeq, ids.length.toLong, fill,
              ids.toArray, offs.toArray, tokens)
            nextSeq += 1
            out
          }
        }
      }
  }

  /** Serial reference packer (test oracle): same next-fit recurrence over
    * one in-memory group. */
  private[graft] def packSerial(nToks: Seq[Long], capacity: Long): Seq[Long] = {
    var seq = 0L
    var fill = 0L
    var started = false
    nToks.map { n =>
      if (!started) { fill = n; started = true }
      else if (fill + n > capacity) { seq += 1; fill = n }
      else fill += n
      seq
    }
  }
}
