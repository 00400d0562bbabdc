package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE contract: training order, the one-merge-per-step apply rule,
  * and the native expression's equality with the in-memory kernel.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns merges in (count desc, left asc, right asc) order") {
    // "abab" x3 + "ab" x2: pair (a,b) count 8 beats (b,a) count 3.
    val m = Bpe.train(Seq(("abab", 3L), ("ab", 2L)), nMerges = 2)
    assert(m.lefts(0) == "a" && m.rights(0) == "b")
    // after merging: words are [ab, ab] x3 and [ab] x2 -> pair
    // (ab, ab) count 3 is the second merge
    assert(m.lefts(1) == "ab" && m.rights(1) == "ab")
  }

  test("train stops early when no pair repeats and ties break lexicographically") {
    val m = Bpe.train(Seq(("xy", 1L)), nMerges = 10)
    assert(m.size == 0, "a pair occurring once must not be merged")
    // "ab" and "ba" both occur twice inside "aba" x2: (a,b) and (b,a)
    // tie at 2 -> lexicographic (a,b) wins round one
    val tie = Bpe.train(Seq(("aba", 2L)), nMerges = 1)
    assert(tie.lefts(0) == "a" && tie.rights(0) == "b")
  }

  test("encodeWord merges the leftmost occurrence of the lowest rank, one per step") {
    // ranks: 0 = (a,b), 1 = (ab,c)
    val m = Bpe.Merges(Array("a", "ab"), Array("b", "c"))
    assert(m.encodeWord("abc").toSeq == Seq("abc"))
    // "abab": step1 merges LEFTMOST (a,b) -> [ab, a, b]; step2 the
    // remaining (a,b) -> [ab, ab]; no (ab,ab) rank -> stop
    assert(m.encodeWord("abab").toSeq == Seq("ab", "ab"))
    // unknown chars pass through as singletons
    assert(m.encodeWord("zq").toSeq == Seq("z", "q"))
    assert(m.encodeWord("").isEmpty)
  }

  test("native BpeSubwords equals the kernel over the real corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val vocab = docs
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok").asc).limit(4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val m = Bpe.train(vocab, nMerges = 48)
    assert(m.size > 0, "corpus should yield learnable merges")
    val viaExpr = docs
      .select(col("doc_id"),
        graft.functions.BpeSubwords(
          graft.text.TextAnalysis.tokens(col("text")), m).as("subs"))
      .orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
    val direct = docs.select(col("doc_id"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
      .map { case (id, text) =>
        (id, text.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .flatMap(m.encodeWord).toSeq)
      }
    assert(viaExpr.map(p => (p._1, p._2)).toSeq == direct.toSeq)
    // fertility sanity: subwords never fewer than tokens is FALSE for
    // BPE (merges shrink), but total subwords must be >= token count
    // only when no full-word merges exist; instead assert every
    // token's segments concatenate back to the token (losslessness)
    val broken = direct.flatMap { case (_, subs) => subs }
      .filter(s => s.isEmpty)
    assert(broken.isEmpty)
  }

  test("segmentation is lossless: subwords concatenate back to each word") {
    val m = Bpe.train(Seq(("window", 5L), ("windows", 3L), ("widow", 2L)), 16)
    Seq("window", "windows", "widow", "win", "unseen").foreach { w =>
      assert(m.encodeWord(w).mkString == w, s"lossy segmentation of $w")
    }
  }

  test("marked encode ∘ decode = id for arbitrary marker-free streams and tables") {
    // the t42 contract, driven by 200 seeded-random (vocab, merges,
    // token stream) triples: mark non-final subwords with "@@", join
    // with spaces, delete every "@@ " — the original stream reappears.
    val rng = new scala.util.Random(42)
    val alpha = "abcdef"
    def word(): String =
      (0 until (1 + rng.nextInt(8))).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    (0 until 200).foreach { trial =>
      val vocab = Seq.fill(1 + rng.nextInt(10))(word())
        .map(w => (w, (1 + rng.nextInt(5)).toLong))
      val m = Bpe.train(vocab, nMerges = rng.nextInt(20))
      val toks = Seq.fill(rng.nextInt(12))(word())
      val marked = toks.flatMap { w =>
        val subs = m.encodeWord(w)
        subs.zipWithIndex.map { case (s, i) =>
          if (i < subs.length - 1) s + "@@" else s
        }
      }
      val decoded = marked.mkString(" ").replace("@@ ", "")
      assert(decoded == toks.mkString(" "),
        s"trial $trial: round-trip broke for $toks via $marked")
    }
  }

  test("t52 byte-level encode ∘ decode = id for arbitrary streams INCLUDING multi-byte UTF-8, any table") {
    // the byte-fallback contract: hex-pair base alphabet means no
    // input is out-of-alphabet — accents, CJK, emoji (surrogate
    // pairs), and tokens wholly unseen at train time all decode back
    // byte-exactly. 200 seeded-random (vocab, merges, stream) triples.
    val rng = new scala.util.Random(1234)
    val pieces = Seq("a", "b", "é", "ß", "漢", "字", "🙂", "ё", "ن")
    def word(): String =
      (0 until (1 + rng.nextInt(6))).map(_ => pieces(rng.nextInt(pieces.length))).mkString
    (0 until 200).foreach { trial =>
      val vocab = Seq.fill(1 + rng.nextInt(10))(word())
        .map(w => (w, (1 + rng.nextInt(5)).toLong))
      val m = Bpe.trainBytes(vocab, nMerges = rng.nextInt(24))
      val toks = Seq.fill(rng.nextInt(12))(word())
      // no [UNK]: EVERY word segments into hex symbols that
      // reassemble to its exact UTF-8 bytes
      toks.foreach { w =>
        val subs = m.encodeBytes(w)
        val bytes = subs.mkString.grouped(2)
          .map(Integer.parseInt(_, 16).toByte).toArray
        assert(new String(bytes, "UTF-8") == w,
          s"trial $trial: byte segmentation lossy for $w")
      }
      // the t52 stream decode rule (mark, join, strip, un-hex)
      val marked = toks.flatMap { w =>
        val subs = m.encodeBytes(w)
        subs.zipWithIndex.map { case (s, i) =>
          if (i < subs.length - 1) s + "@@" else s
        }
      }
      val decoded = marked.mkString(" ").replace("@@ ", "")
        .split(" ", -1).map { h =>
          if (h.isEmpty) ""
          else new String(
            h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")
        }.mkString(" ")
      assert(decoded == toks.mkString(" "),
        s"trial $trial: byte round-trip broke for $toks via $marked")
    }
  }

  test("t52 round-trip verdict holds corpus-wide on the shipped fixture") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val out = graft.SparkEntry.queries("t52_byte_bpe_roundtrip")(spark, dir)
    assert(out.where(!col("roundtrip_ok")).count() == 0,
      "the byte alphabet must round-trip every document")
    assert(out.where(col("n_continuations") < 0).count() == 0)
    // byte-level fertility floor: every subword is ≥ 1 byte, so
    // n_subwords ≥ n_tokens with equality only when every token
    // merged to a single symbol
    assert(out.where(col("n_subwords") < col("n_tokens")).count() == 0)
  }

  test("t42 round-trip verdict holds corpus-wide on the shipped fixture") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val out = graft.SparkEntry.queries("t42_bpe_roundtrip")(spark, dir)
    assert(out.where(!col("roundtrip_ok")).count() == 0,
      "a whitespace-token corpus without '@' must round-trip everywhere")
    // the marked stream really is longer where merges stopped short of
    // whole words: continuations = subwords - tokens, non-negative
    assert(out.where(col("n_continuations") < 0).count() == 0)
  }
}
