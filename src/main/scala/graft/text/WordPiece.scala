package graft.text

import scala.collection.mutable

/** WordPiece tokenizer (Schuster & Nakajima, ICASSP 2012; the
  * BERT-family face, per the public BERT paper and the HuggingFace
  * tokenizers documentation): TRAIN grows a vocabulary like BPE but
  * scores each candidate pair by LIKELIHOOD LIFT
  * freq(ab)/(freq(a)·freq(b)) instead of raw count — the pair whose
  * merge most increases a unigram LM's corpus likelihood; APPLY is
  * greedy longest-match-first with "##" continuation pieces and a
  * whole-word [UNK] on any failure (the standard WordPiece encode,
  * categorically different from BPE's merge replay and unigram's
  * Viterbi DP — which is why it completes the tokenizer trio).
  *
  * Scale design = the [[Bpe]] / PqCodebook bounded driver fit:
  * training is driver-side on the capped word-frequency sample, the
  * learned vocabulary (a few KB) broadcasts into a native expression
  * ([[graft.functions.WordPieceEncode]]) that encodes the corpus in
  * one narrow projection.
  *
  * Determinism contract: TRAIN picks each merge by exact-integer
  * score comparison (cross-multiplied BigInt — s₁ > s₂ ⟺
  * p₁·l₂·r₂ > p₂·l₁·r₁, no float ratios), ties to the
  * lexicographically smallest (left, right); merges apply to all
  * non-overlapping occurrences left-to-right. APPLY's greedy
  * longest-match is deterministic by construction (at a fixed
  * position and length at most one vocabulary piece matches), so the
  * DuckDB oracle replays it exactly as a recursive CTE joining the
  * dumped vocabulary — no length literal needed: the join IS the
  * candidate search.
  *
  * Documented blind spot (the t42 "@@" class): a corpus token that
  * itself begins with "##" would collide with the continuation
  * notation; absent from the whitespace-token fixtures.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** A learned vocabulary: word-initial pieces (bare) and
    * continuation pieces (stored WITH the "##" prefix).
    */
  final case class Vocab(pieces: Array[String]) {

    @transient private lazy val bare: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      pieces.foreach(p => if (!p.startsWith("##")) s.add(p))
      s
    }
    @transient private lazy val cont: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      pieces.foreach(p => if (p.startsWith("##")) s.add(p.substring(2)))
      s
    }
    @transient private lazy val maxBare: Int =
      if (bare.isEmpty) 0
      else { var m = 0; bare.forEach(p => m = math.max(m, p.length)); m }
    @transient private lazy val maxCont: Int =
      if (cont.isEmpty) 0
      else { var m = 0; cont.forEach(p => m = math.max(m, p.length)); m }

    /** Greedy longest-match-first segmentation; any position with no
      * match collapses the WHOLE word to [UNK] (the standard rule).
      */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      val out = mutable.ArrayBuffer[String]()
      var pos = 0
      while (pos < word.length) {
        val first = pos == 0
        val cap = math.min(word.length - pos, if (first) maxBare else maxCont)
        var l = cap
        var hit: String = null
        while (l >= 1 && hit == null) {
          val body = word.substring(pos, pos + l)
          if (first) { if (bare.contains(body)) hit = body }
          else if (cont.contains(body)) hit = "##" + body
          l -= 1
        }
        if (hit == null) return Array(Unk)
        out += hit
        pos += hit.length - (if (pos == 0) 0 else 2)
      }
      out.toArray
    }
  }

  /** Train on a (word, freq) sample: start from single-character
    * pieces (first char bare, rest "##"-prefixed), run `nMerges`
    * likelihood-lift merges. Returns the vocabulary = initial
    * alphabet pieces ∪ merge outputs, sorted for a deterministic
    * dump order.
    */
  def train(vocabSample: Seq[(String, Long)], nMerges: Int): Vocab = {
    // current segmentation of each distinct word
    val words = vocabSample.filter(_._1.nonEmpty).map { case (w, f) =>
      val syms = mutable.ArrayBuffer[String](w.charAt(0).toString)
      var i = 1
      while (i < w.length) { syms += "##" + w.charAt(i); i += 1 }
      (syms, f)
    }
    val vocab = mutable.SortedSet[String]()
    words.foreach(_._1.foreach(vocab += _))
    var m = 0
    var exhausted = false
    while (m < nMerges && !exhausted) {
      val symFreq = mutable.HashMap[String, Long]().withDefaultValue(0L)
      val pairFreq =
        mutable.HashMap[(String, String), Long]().withDefaultValue(0L)
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          symFreq(syms(i)) += f
          if (i < syms.length - 1) pairFreq((syms(i), syms(i + 1))) += f
          i += 1
        }
      }
      if (pairFreq.isEmpty) exhausted = true
      else {
        // argmax of p/(l·r) by exact cross-multiplied integers,
        // (left, right) lexicographic tie-break
        var best: (String, String) = null
        var bestP = 0L; var bestL = 0L; var bestR = 0L
        pairFreq.foreach { case ((l, r), p) =>
          val lf = symFreq(l); val rf = symFreq(r)
          val better =
            if (best == null) true
            else {
              val cmp = (BigInt(p) * bestL * bestR)
                .compare(BigInt(bestP) * lf * rf)
              cmp > 0 || (cmp == 0 &&
                Ordering.Tuple2[String, String].lt((l, r), best))
            }
          if (better) { best = (l, r); bestP = p; bestL = lf; bestR = rf }
        }
        val (bl, br) = best
        val merged = bl + br.stripPrefix("##")
        vocab += merged
        // replace non-overlapping occurrences left-to-right
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == bl && syms(i + 1) == br) {
              syms(i) = merged
              syms.remove(i + 1)
            }
            i += 1
          }
        }
        m += 1
      }
    }
    Vocab(vocab.toArray)
  }
}
