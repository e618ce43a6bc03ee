package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Budgeted mixture selection — enforcing a training-mixture recipe: per
  * source, select documents in deterministic (doc_id) order until the
  * source's token budget is reached. The budget is the rational fraction
  * `num/den` of the source's total token mass, and the selection
  * predicate is kept in pure integer cross-multiplication
  * (`cum * den <= total * num`) so there is NO division or float anywhere
  * — any SQL engine reproduces the exact same selected set.
  *
  * Upstream ordering is the caller's policy knob: feed doc_id order for
  * reproducible "first-N-tokens" selection (this operator), or feed the
  * deterministic weighted-sample order ([[graft.core.BottomK]] ES keys)
  * for probability-proportional selection — the budget scan is the same.
  *
  * Scale shape: one groupBy for per-source totals (broadcast back — one
  * row per source), one window over (source, doc_id) — a single range
  * shuffle at 100 TB, the same co-location the downstream sequence packer
  * needs, so the two stages share a partitioning. */
object MixtureSelection {

  /** Per-doc selection flags: adds `tok_total` (source token mass), `cum`
    * (running mass through this doc in doc_id order), and `selected`.
    * `docs` needs doc_id (orderable), source, and a long `tokCol`. */
  def withMixtureSelection(docs: DataFrame, tokCol: String,
      num: Long, den: Long): DataFrame = {
    require(den > 0 && num >= 0 && num <= den,
      s"budget fraction must satisfy 0 <= num <= den, got $num/$den")
    val totals = docs.groupBy(col("source"))
      .agg(sum(col(tokCol)).cast("long").as("tok_total"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .join(broadcast(totals), Seq("source"))
      .withColumn("cum", sum(col(tokCol)).over(w).cast("long"))
      .withColumn("selected", col("cum") * den <= col("tok_total") * num)
  }

  /** Per-source selection report (every cell integer-exact): doc counts,
    * selected token mass, the budget bound as the `num/den` fraction
    * check, and `prefix_tight` — whether even the smallest unselected doc
    * would bust the budget. NOT always true: the selection is a prefix
    * (first-N-tokens in order), not a bin-packing, so a later small doc
    * can still fit; the column is a data-dependent diagnostic the oracle
    * recomputes exactly. */
  def mixtureReport(docs: DataFrame, tokCol: String,
      num: Long, den: Long): DataFrame =
    withMixtureSelection(docs, tokCol, num, den)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("selected"), col(tokCol)).otherwise(0L)).cast("long").as("tok_selected"),
        max(col("tok_total")).as("tok_total"),
        // within budget: tok_selected * den <= tok_total * num
        (sum(when(col("selected"), col(tokCol)).otherwise(0L)).cast("long") * den <=
          max(col("tok_total")) * num).as("within_budget"),
        // min() skips the nulls of selected rows; a fully-selected
        // source yields null -> true
        coalesce(
          (sum(when(col("selected"), col(tokCol)).otherwise(0L)).cast("long") +
            min(when(!col("selected"), col(tokCol)))) * den >
            max(col("tok_total")) * num,
          lit(true)).as("prefix_tight"))
      .orderBy(col("source"))
}
