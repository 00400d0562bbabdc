package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.load.Incremental

/** Incremental corpus-statistics maintenance — the retrieval/quality
  * serving stats (document count N, total token length Σdl, per-term
  * document frequency df; the exact inputs of t19's BM25 scorer and the
  * denominators of the t29/t30 LM filters) kept fresh under a growing
  * corpus WITHOUT rescanning history.
  *
  * Every component is an ADDITIVE partial state — counts and sums,
  * where merge(a, b) = a + b — so a delta batch folds in through
  * [[graft.load.Incremental.mergeAggregates]] (one union + re-aggregate
  * on the term key): cost O(|delta| + |vocab|), independent of corpus
  * history size. This is the q49 materialized-view refresh discipline
  * applied to corpus stats — the difference, at 100 TB, between
  * touching one new partition's partials and rescanning the corpus per
  * batch. Derived ratios (avgdl = Σdl / N) are computed FROM the merged
  * sums at read time, never stored — a stored ratio does not merge.
  *
  * Exactness is oracle-proven (t33: the folded stats hash-match a
  * DuckDB full recompute over the whole corpus) and spec-proven on
  * successively growing batch sequences (IncrementalSpec).
  */
object CorpusStats {

  /** Per-term document-frequency partial for one batch: how many of
    * the batch's documents contain each term (per-doc distinct, the df
    * contract). One keyed map-side-combined aggregate.
    */
  def dfPartial(docs: DataFrame, toks: Column): DataFrame =
    docs.select(explode_outer(array_distinct(toks)).as("token"))
      .where(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** (n_docs, total_dl) partial for one batch — one global aggregate;
    * an empty batch contributes the (0, 0) identity.
    */
  def totalsPartial(docs: DataFrame, toks: Column): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(toks).cast("long")), lit(0L)).as("total_dl"))

  /** Fold any number of batch partials into the current corpus stats:
    * (per-term df, one-row totals). Associative and commutative —
    * batch order never matters, the property that makes the fold safe
    * under out-of-order delta arrival.
    */
  def merge(
      dfParts: Seq[DataFrame],
      totParts: Seq[DataFrame]): (DataFrame, DataFrame) =
    (Incremental.mergeAggregates(dfParts, Seq("token"), Seq("df")),
      Incremental.mergeAggregates(totParts, Seq.empty, Seq("n_docs", "total_dl")))
}
