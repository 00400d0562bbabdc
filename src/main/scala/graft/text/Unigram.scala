package graft.text

import scala.collection.mutable

/** Unigram-LM subword tokenizer (Kudo — "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates", ACL 2018; the SentencePiece unigram model, public
  * literature): TRAIN fits piece probabilities by EM over a
  * word-frequency sample; APPLY segments a word into the
  * maximum-likelihood piece sequence by Viterbi. Together with
  * [[Bpe]] this closes the tokenizer family — BPE composes greedily
  * from merges, unigram-LM PRUNES from a rich seed vocabulary and
  * segments globally optimally.
  *
  * Scale design (the Bpe.train / PqCodebook.fit discipline): training
  * runs DRIVER-SIDE on a BOUNDED word-frequency sample — tokenizers
  * are always fit on samples — and the learned table (a few KB)
  * rides into a native expression
  * ([[graft.functions.UnigramEncode]]) that segments the full corpus
  * in one narrow projection.
  *
  * Determinism contract — the part a DuckDB oracle must replay
  * bit-for-bit: the DUMPED model carries INTEGER costs
  * (`round(−10⁶·ln p)`), and Viterbi runs entirely in integer
  * arithmetic with one stated tie rule — minimize total cost, ties
  * broken by the SMALLEST piece-start position (equivalently the
  * LONGEST final piece). EM itself uses driver-side doubles (one
  * machine, no cross-engine seam); every engine-facing artifact is
  * exact integers. Hard-EM (Viterbi counts rather than
  * forward-backward expectations) is the documented simplification:
  * each E-step quantizes the current probabilities to the SAME
  * integer-cost model the final apply uses, so training and apply
  * share one segmentation rule. A character absent from the model
  * segments as a single-char piece at `unkCost` (strictly above
  * every learned cost, so known pieces always win).
  */
object Unigram {

  /** A learned piece table; costs are −10⁶·ln p rounded to integers. */
  final case class Model(
      pieces: Array[String], costs: Array[Long],
      maxPieceLen: Int, unkCost: Long) {

    def size: Int = pieces.length

    @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](size * 2)
      var i = 0
      while (i < size) { m.put(pieces(i), costs(i)); i += 1 }
      m
    }

    /** Viterbi segmentation: the min-total-cost piece sequence, ties
      * by smallest start position of the last piece at every DP cell
      * (strict `<` with ascending start keeps the first). Returns the
      * pieces and the total cost.
      */
    def encodeWord(word: String): (Array[String], Long) = {
      val n = word.length
      if (n == 0) return (Array.empty[String], 0L)
      val dp = Array.fill(n + 1)(Long.MaxValue)
      val back = Array.fill(n + 1)(-1)
      dp(0) = 0L
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          if (dp(j) != Long.MaxValue) {
            val c = table.get(word.substring(j, i))
            val cost: Long =
              if (c != null) c.longValue()
              else if (i - j == 1) unkCost
              else -1L
            if (cost >= 0L) {
              val cand = dp(j) + cost
              if (cand < dp(i)) { dp(i) = cand; back(i) = j }
            }
          }
          j += 1
        }
        i += 1
      }
      val out = mutable.ArrayBuffer[String]()
      var k = n
      while (k > 0) { out += word.substring(back(k), k); k = back(k) }
      (out.reverse.toArray, dp(n))
    }
  }

  /** Fit a model from (word, frequency) pairs: seed = every substring
    * up to `maxPieceLen` (all single chars kept unconditionally; the
    * top multi-char substrings by frequency·length, count ≥ 2, up to
    * `vocabSize`), then `iters` rounds of hard EM — segment the sample
    * under the current integer-quantized costs, recount pieces by
    * Viterbi usage (single chars add-one-smoothed so they never
    * vanish), drop unused multi-char pieces, re-estimate p = c/Σc.
    */
  def train(
      wordFreq: Seq[(String, Long)],
      vocabSize: Int = 512,
      maxPieceLen: Int = 6,
      iters: Int = 3): Model = {
    val subCounts = mutable.HashMap[String, Long]()
    for ((w, f) <- wordFreq; l <- 1 to math.min(maxPieceLen, w.length);
         i <- 0 to w.length - l) {
      val p = w.substring(i, i + l)
      subCounts(p) = subCounts.getOrElse(p, 0L) + f
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toSeq.sorted
    val multi = subCounts.iterator
      .filter { case (p, c) => p.length > 1 && c >= 2 }
      .toSeq
      // favor long, frequent substrings; piece text as the
      // deterministic tiebreak
      .sortBy { case (p, c) => (-c * p.length, p) }
      .take(math.max(0, vocabSize - chars.size))
      .map(_._1)
    var counts: Map[String, Double] =
      (chars ++ multi).map(p => p -> subCounts(p).toDouble).toMap
    def quantize(cs: Map[String, Double]): Model = {
      val total = cs.values.sum
      val ps = cs.keys.toArray.sorted
      val costs = ps.map { p =>
        math.max(0L, math.round(-1e6 * math.log(cs(p) / total)))
      }
      Model(ps, costs, maxPieceLen, costs.max + 1000000L)
    }
    var round = 0
    while (round < iters) {
      val m = quantize(counts)
      val used = mutable.HashMap[String, Double]()
      for ((w, f) <- wordFreq; p <- m.encodeWord(w)._1)
        used(p) = used.getOrElse(p, 0.0) + f.toDouble
      counts = counts.keysIterator.flatMap { p =>
        val c = used.getOrElse(p, 0.0)
        if (p.length == 1) Some(p -> (c + 1.0)) // singles never vanish
        else if (c > 0.0) Some(p -> c)
        else None // prune unused multi-char pieces
      }.toMap
      round += 1
    }
    quantize(counts)
  }
}
