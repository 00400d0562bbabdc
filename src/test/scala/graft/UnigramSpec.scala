package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

/** Unigram-LM contract: Viterbi optimality (against brute-force
  * enumeration), the stated tie rule, losslessness, train invariants,
  * and the native expression's equality with the in-memory kernel.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of `w` under `m`'s candidate rule (pieces in
    * the table at their cost, single chars at unkCost otherwise),
    * with total cost — exponential, so words stay short.
    */
  private def enumerate(m: Unigram.Model, w: String): Seq[(Seq[String], Long)] = {
    val costOf: String => Option[Long] = p => {
      val i = m.pieces.indexOf(p)
      if (i >= 0) Some(m.costs(i))
      else if (p.length == 1) Some(m.unkCost)
      else None
    }
    def go(from: Int): Seq[(List[String], Long)] =
      if (from == w.length) Seq((Nil, 0L))
      else (1 to math.min(m.maxPieceLen, w.length - from)).flatMap { l =>
        val p = w.substring(from, from + l)
        costOf(p).toSeq.flatMap(c =>
          go(from + l).map { case (rest, rc) => (p :: rest, c + rc) })
      }
    go(0).map { case (ps, c) => (ps.toSeq, c) }
  }

  test("Viterbi returns a minimum-cost segmentation (seeded sweep vs brute force)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    (1 to 60).foreach { k =>
      // random model: random multi-char pieces over a tiny alphabet +
      // all single chars, random integer costs
      val singles = alphabet.map(_.toString)
      val multis = Seq.fill(6 + rnd.nextInt(10)) {
        val l = 2 + rnd.nextInt(3)
        Seq.fill(l)(alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct
      val pieces = (singles ++ multis).distinct.sorted.toArray
      val costs = pieces.map(_ => 1L + rnd.nextInt(1000000).toLong)
      val m = Unigram.Model(pieces, costs, maxPieceLen = 4,
        unkCost = costs.max + 1000000L)
      val w = Seq.fill(1 + rnd.nextInt(9))(
        // include a char OUTSIDE the alphabet sometimes — unk path
        if (rnd.nextInt(8) == 0) 'z'
        else alphabet(rnd.nextInt(alphabet.length))).mkString
      val (got, gotCost) = m.encodeWord(w)
      val all = enumerate(m, w)
      assert(all.nonEmpty, s"case $k: no segmentation of $w")
      val best = all.map(_._2).min
      assert(gotCost == best, s"case $k: $w cost $gotCost != brute $best")
      assert(got.mkString == w, s"case $k: lossy segmentation of $w")
      // the DP's own cost must equal the sum of its pieces' costs
      val recomputed = got.map { p =>
        val i = m.pieces.indexOf(p)
        if (i >= 0) m.costs(i) else m.unkCost
      }.sum
      assert(recomputed == gotCost, s"case $k: cost bookkeeping on $w")
    }
  }

  test("ties break to the smallest start position (longest last piece)") {
    // "ab": pieces a, b, ab all cost 10 -> [a, b] costs 20, [ab] costs
    // 10: unambiguous. Make the tie explicit: cost(ab) = 20 exactly
    // equals cost(a)+cost(b); the rule picks the SMALLEST start for
    // the last piece, i.e. the single piece [ab].
    val m = Unigram.Model(Array("a", "ab", "b"), Array(10L, 20L, 10L),
      maxPieceLen = 2, unkCost = 1000000L)
    val (ps, c) = m.encodeWord("ab")
    assert(c == 20L && ps.toSeq == Seq("ab"))
  }

  test("train keeps every single char, prices pieces positively, and is deterministic") {
    val sample = Seq(("window", 9L), ("windows", 5L), ("widow", 3L),
      ("win", 4L), ("dow", 2L))
    val m1 = Unigram.train(sample, vocabSize = 32, maxPieceLen = 6, iters = 3)
    val m2 = Unigram.train(sample, vocabSize = 32, maxPieceLen = 6, iters = 3)
    assert(m1.pieces.toSeq == m2.pieces.toSeq &&
      m1.costs.toSeq == m2.costs.toSeq, "fit must be deterministic")
    val chars = sample.flatMap(_._1.toSeq).map(_.toString).distinct
    chars.foreach(c => assert(m1.pieces.contains(c), s"missing single '$c'"))
    assert(m1.costs.forall(_ >= 0L))
    assert(m1.unkCost > m1.costs.max, "unk must lose to every known piece")
    // the sample's dominant word should segment into few pieces
    assert(m1.encodeWord("window")._1.length <= 3)
  }

  test("native UnigramEncode equals the kernel over the real corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val vocab = docs
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok").asc).limit(4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val m = Unigram.train(vocab, vocabSize = 512, maxPieceLen = 6, iters = 3)
    assert(m.size > vocab.flatMap(_._1.toSeq).distinct.size,
      "corpus should yield multi-char pieces")
    val viaExpr = docs
      .select(col("doc_id"), graft.functions.UnigramEncode(
        graft.text.TextAnalysis.tokens(col("text")), m).as("enc"))
      .select(col("doc_id"), col("enc.pieces"), col("enc.cost"))
      .orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect()
    val direct = docs.select(col("doc_id"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
      .map { case (id, text) =>
        val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val encs = words.map(m.encodeWord)
        (id, encs.flatMap(_._1).toSeq, encs.map(_._2).sum)
      }
    assert(viaExpr.toSeq == direct.toSeq)
    // losslessness over the whole corpus: pieces rejoin to the stream
    direct.zip(docs.select(col("text")).orderBy(col("doc_id"))
      .as[String].collect()).foreach { case ((_, pieces, _), text) =>
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(pieces.mkString == words.mkString)
    }
  }
}
