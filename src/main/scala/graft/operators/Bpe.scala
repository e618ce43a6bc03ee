package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-encoding MERGE APPLICATION — the operator between raw text
  * and a trainer's `tokens` column that the pipeline previously assumed:
  * given a learned merges table (symbol pair -> rank), encode each
  * [[TextPipeline.BpeIshPattern]] pre-token by repeatedly merging the
  * adjacent pair with the LOWEST rank (all occurrences, leftmost-first)
  * until no ranked pair remains — the standard greedy BPE encoder
  * (Sennrich et al. 2016 §3.2).
  *
  * Engine-portable oracle semantics: greedy lowest-rank-first encoding is
  * VALUE-EQUAL to applying the merges sequentially in rank order, each
  * exhaustively (one left-to-right pass), because merging rank r creates
  * only pairs that contain the new token xy, and any merge involving xy
  * must have been learned AFTER r — so no merge can resurrect a lower
  * rank, and one pass per rank suffices (merging (x,y) cannot create a
  * new (x,y): that would need y == xy or x == xy). The DuckDB oracle
  * exploits this: each word becomes a 0x01-bounded symbol string and each
  * merge a literal `replace()` — applied TWICE per rank, because string
  * replacement is weaker than the list pass on ADJACENT occurrences: in
  * `x y x y` the first replacement consumes the boundary byte the second
  * occurrence needs, so one pass merges only the odd-indexed occurrences
  * of a run. Each survivor is then isolated between merged tokens (fully
  * re-bounded), so the second pass merges them all, and a third pass can
  * never match. This equivalence requires every merge's LEFT != RIGHT
  * (all of [[FixtureMerges]]; enforced by `rankMap`): for a
  * self-pair like (x, x), occurrences OVERLAP and the string replay's
  * leftmost-nonoverlap choice can differ from the list pass's (`x x x x x`
  * tokenizes xx|xx|x by the list pass but xx|x|xx by the replay). The
  * greedy kernel itself has no such restriction — only the string-replay
  * oracle does.
  *
  * Scale shape: a pure map-side projection (one kernel UDF per row, merge
  * ranks broadcast via the task binary — a real vocab's ~50k merges is a
  * ~1 MB map, closure-shippable; a larger one would ride an explicit
  * broadcast). No shuffle anywhere.
  */
object Bpe {

  /** A tiny committed merges fixture over the corpus's English letter
    * distribution, in rank order. Every merged token's constituents exist
    * before its rank (the validity precondition of the sequential-replay
    * equivalence above). */
  val FixtureMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("an", "d"), ("o", "n"), ("e", "n"), ("o", "r"), ("r", "e"),
    ("a", "t"), ("s", "t"))

  /** Greedy BPE encode of one pre-token: start from single characters,
    * repeatedly merge ALL occurrences (leftmost-first, non-overlapping) of
    * the present pair with the lowest rank. O(len^2 * distinct-pairs) worst
    * case on pathological words; linear-ish on natural text. */
  private[graft] def encodeWord(word: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var n = syms.length
    while (n > 1) {
      // lowest-rank pair present
      var best = Int.MaxValue
      var bi = 0
      while (bi < n - 1) {
        val r = ranks.get(syms(bi) + " " + syms(bi + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        bi += 1
      }
      if (best == Int.MaxValue) return java.util.Arrays.copyOf(syms, n)
      // merge all occurrences of the best pair, leftmost-first
      val out = new Array[String](n)
      var o = 0
      var j = 0
      while (j < n) {
        if (j < n - 1 && {
          val r = ranks.get(syms(j) + " " + syms(j + 1)); r != null && r.intValue() == best
        }) {
          out(o) = syms(j) + syms(j + 1); j += 2
        } else {
          out(o) = syms(j); j += 1
        }
        o += 1
      }
      syms = out
      n = o
    }
    java.util.Arrays.copyOf(syms, n)
  }

  /** Boxed Integer values, NOT Int: `HashMap[String, Int].get` on a missing
    * key would auto-unbox null to 0 — a VALID rank — silently merging
    * unlearned pairs. Self-pairs (left == right) are rejected here because
    * the SQL-replay oracle is only exact for disjoint-occurrence merges
    * (see the object scaladoc); real tokenizers' repeated-character merges
    * would need a dedicated oracle before lifting this. */
  private def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    // constructive validity check (ADVICE r6): each constituent must be a
    // single character or the concatenation produced by an earlier-ranked
    // merge — the precondition the sequential/string-replay oracle
    // equivalence rests on. An invalid future edit to FixtureMerges now
    // fails HERE with the offending pair named, not as an opaque oracle
    // mismatch at gate time.
    val produced = new java.util.HashSet[String]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      require(a.nonEmpty && b.nonEmpty, "BPE merge symbols must be non-empty")
      require(a != b, s"BPE merge ($a, $b): self-pairs are outside the SQL-replay contract")
      def valid(s: String): Boolean = s.length == 1 || produced.contains(s)
      require(valid(a) && valid(b),
        s"BPE merge #$r ($a, $b): constituent ${if (valid(a)) b else a} is neither a " +
          "single character nor the product of an earlier-ranked merge")
      produced.add(a + b)
      m.put(a + " " + b, Integer.valueOf(r))
    }
    m
  }

  /** Adds `bpe_tokens: array<string>` — the concatenated greedy-BPE
    * encodings of the text's regex pre-tokens. The kernel is an imperative
    * UDF by the measured text-kernel rule (the merge loop IS the cost; the
    * encoder boundary is the small share — see BASELINE.md). */
  def withBpeTokens(docs: DataFrame, textCol: String = "text",
      merges: Seq[(String, String)] = FixtureMerges): DataFrame = {
    val ranks = rankMap(merges)
    val pattern = java.util.regex.Pattern.compile(TextPipeline.BpeIshPattern)
    val f = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String]()
        val m = pattern.matcher(text)
        while (m.find()) out ++= encodeWord(m.group(), ranks)
        out.toArray
      }
    }
    docs.withColumn("bpe_tokens", f(col(textCol)))
  }

  /** Pre-token character mass (merge accounting: every merge reduces the
    * symbol count by exactly one, so chars - bpe_tokens = merges applied). */
  def preTokenChars(textCol: Column): Column =
    length(array_join(TextPipeline.regexTokens(textCol), ""))
}
