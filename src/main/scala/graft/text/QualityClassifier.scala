package graft.text

/** fastText-style model-based document filter at toy scale: logistic
  * regression over hashed bag-of-words COUNT features (1024 md5
  * buckets) distilling a quality heuristic into a cheap linear model —
  * the model-based filtering stage of a curation pipeline
  * (CCNet-family trains fastText on pseudo-labels the same way; here
  * the pseudo-label is the stopword-ratio rule, which is exactly
  * linear in count features, so the fit has a realizable target).
  *
  * The FIT is driver-side on a BOUNDED sample (the BPE / ANN-quantizer
  * discipline: model fitting cost must not grow with the corpus), full
  * batch gradient descent with a fixed epoch count and zero init —
  * deterministic for a deterministically ordered sample. The learned
  * weights are quantized to integer MICRO-UNITS before use, so the
  * APPLY stage (the part that runs over 100 TB) is an exact integer
  * dot product per document — order-independent, replayable by the
  * oracle from the dumped weight table (the g01/q117 fixed-point
  * discipline at the model boundary).
  */
object QualityClassifier {

  val Buckets = 1024

  /** The quality pseudo-label: stopword ratio > 6% — stated as the
    * exact integer comparison `100·n_stop > 6·n_tok` so no float
    * boundary exists to disagree on.
    */
  val StopWords: Set[String] = Set("the", "a")
  def label(toks: Array[String]): Boolean = {
    val nStop = toks.count(StopWords)
    100L * nStop > 6L * toks.length
  }

  /** The engine's token bucket, replicated driver-side: first 15 hex
    * chars of md5 as a positive 60-bit value, mod [[Buckets]] —
    * identical to `KmvSketch.hash64(tok) % 1024` and to the oracle's
    * `('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024`.
    */
  def bucket(token: String): Int = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    val hex = md5.take(8).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % Buckets).toInt
  }

  /** The engine tokenizer's driver-side twin (lower, split on
    * whitespace, drop empties — `TextAnalysis.tokens`' contract).
    */
  def tokens(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Full-batch logistic regression over bucket counts; returns
    * (weights, bias) in micro-units. Deterministic: inputs are
    * processed in the given order with zero init and a fixed schedule.
    */
  def fit(
      docs: Seq[(String, Boolean)], // (text, label)
      epochs: Int = 300,
      lr: Double = 0.05): (Array[Long], Long) = {
    val feats = docs.map { case (text, y) =>
      val counts = scala.collection.mutable.LinkedHashMap[Int, Double]()
      tokens(text).foreach { t =>
        val b = bucket(t)
        counts(b) = counts.getOrElse(b, 0.0) + 1.0
      }
      (counts.toSeq.sortBy(_._1), if (y) 1.0 else 0.0)
    }
    val n = math.max(feats.size, 1)
    val w = new Array[Double](Buckets)
    var b = 0.0
    var epoch = 0
    while (epoch < epochs) {
      val gw = new Array[Double](Buckets)
      var gb = 0.0
      feats.foreach { case (cs, y) =>
        var z = b
        cs.foreach { case (i, c) => z += w(i) * c }
        val p = 1.0 / (1.0 + math.exp(-z))
        val g = p - y
        gb += g
        cs.foreach { case (i, c) => gw(i) += g * c }
      }
      var i = 0
      while (i < Buckets) { w(i) -= lr * gw(i) / n; i += 1 }
      b -= lr * gb / n
      epoch += 1
    }
    (w.map(x => Math.round(x * 1e6)), Math.round(b * 1e6))
  }
}
