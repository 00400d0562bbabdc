package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every variant is shuffle-bounded by the *candidate*
  * key (content hash, LSH band, SimHash block), never by an all-pairs
  * product. At 100 TB the only shuffles are groupBys on those keys;
  * pair generation happens within key-groups (self-join on the key),
  * so cost is Σ|bucket|², controlled by band/block width — the
  * standard MinHash-LSH design (Broder '97; Leskovec et al., MMDS
  * ch.3). All hashing is md5/xxhash64 column expressions: codegen'd,
  * deterministic, no UDFs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on normalized content: md5 over the lowercased token
    * stream. Returns the input plus `content_hash`, `group_size`, and
    * `is_canonical` (true for the minimum `idCol` of each group — the
    * deterministic survivor).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = md5(concat_ws(" ", TextAnalysis.tokens(col(textCol))))
    val w = Window.partitionBy(col("content_hash"))
    df.withColumn("content_hash", h)
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }

  /** Survivors only — one row per distinct content hash. */
  def exactDedupKeep(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactDedup(df, textCol, idCol).where(col("is_canonical"))
      .drop("is_canonical")

  // -------------------------------------------------------------- minhash

  /** MinHash signature of the word k-gram shingle set: element i is
    * `min(md5(i || "|" || shingle))` — `numHashes` independent
    * permutation approximations from one md5 family. String mins are
    * as collision-sound as integer mins and reproducible in any engine
    * with md5.
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val sh = TextAnalysis.shingles(text, k)
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => md5(concat(i, lit("|"), s)))))
  }

  /** LSH band keys from a MinHash signature: `bands` groups of
    * `rowsPerBand` consecutive signature elements, each folded to one
    * md5. Two documents share a band key iff that band's rows all
    * match — P[candidate] = 1-(1-j^r)^b for Jaccard j.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat(b, lit(":"),
        concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))))

  /** Exact Jaccard similarity of the two documents' distinct shingle
    * sets (the verification step after LSH candidate generation).
    */
  def jaccardShingles(a: Column, b: Column, k: Int): Column = {
    val sa = array_distinct(TextAnalysis.shingles(a, k))
    val sb = array_distinct(TextAnalysis.shingles(b, k))
    when(size(sa) === 0 && size(sb) === 0, lit(1.0))
      .when(size(sa) === 0 || size(sb) === 0, lit(0.0))
      .otherwise(
        size(array_intersect(sa, sb)).cast("double")
          / size(array_union(sa, sb)))
  }

  /** MinHash+LSH near-duplicate pairs, exact-Jaccard verified.
    *
    * Plan shape (the part that must survive 100×): shingle+sign each doc
    * (narrow) → explode band keys (×bands) → self-join on band key
    * (shuffle on band key only; bucket sizes are the skew control) →
    * distinct candidate pair → exact Jaccard on the pair (narrow) →
    * threshold filter. No stage touches the n² product.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    */
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(col(textCol), k, numHashes)
    val banded = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("band", explode(lshBandKeys(sig, bands, rowsPerBand)))
    val a = banded.select(col("band"), col("id").as("id_a"), col("text").as("text_a"))
    val b = banded.select(col("band"), col("id").as("id_b"), col("text").as("text_b"))
    a.join(b, Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"))
      .distinct()
      .withColumn("jaccard", jaccardShingles(col("text_a"), col("text_b"), k))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** 48-bit SimHash over whitespace tokens (Charikar '02, as used by
    * Manku et al. WWW'07 for web-scale near-dup detection): each token
    * hashes to 48 bits (the first 12 hex chars of its md5); bit j of the
    * output is 1 iff the sum over tokens of ±1 (per that token's bit j)
    * is positive. md5-derived bits keep every value engine-independent
    * (any SQL engine reproduces it), and 48 bits keeps all intermediates
    * inside a BIGINT.
    */
  def simhash(text: Column, bits: Int = 48): Column = {
    require(bits % 4 == 0 && bits <= 60, s"bits must be a multiple of 4 <= 60, got $bits")
    val powers = typedLit((0 until bits).map(1L << _))
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks,
      t => conv(substring(md5(t), 1, bits / 4), 16, 10).cast("long"))
    // One pass over the token hashes, accumulating all `bits` signed
    // counts as an array (bit j tested via AND with 2^j — no
    // shift-by-column needed, and md5 runs once per token).
    val bitSums = aggregate(
      hashes,
      typedLit(Seq.fill(bits)(0L)),
      (acc, h) => zip_with(acc, powers,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(bitSums, powers, (s, p) => when(s > 0, p).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
  }

  /** Hamming distance between two SimHash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs within Hamming distance `maxDist`.
    *
    * Block-and-verify (Manku et al.): split the 48-bit hash into
    * `maxDist+1` blocks — two hashes within Hamming distance maxDist
    * must agree exactly on ≥1 block (pigeonhole), so candidates are a
    * self-join on (block index, block value), never all-pairs.
    */
  def simhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3,
      bits: Int = 48): DataFrame = {
    val nBlocks = maxDist + 1
    val blockBits = bits / nBlocks
    val hashed = df.select(col(idCol).as("id"), simhash(col(textCol), bits).as("sh"))
    val blocked = hashed.withColumn(
      "block",
      explode(array((0 until nBlocks).map { i =>
        concat(lit(s"$i:"),
          shiftright(col("sh"), i * blockBits)
            .bitwiseAND(lit((1L << blockBits) - 1)))
      }: _*)))
    val a = blocked.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")).cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * `threshold`, candidates generated by random-hyperplane LSH bucket
    * join (see [[graft.similarity.Similarity.hyperplaneSignature]]) so
    * the product space is never materialized. For exhaustive
    * (guaranteed-complete) pairs at small scale use `bruteForce = true`.
    */
  def embeddingNearDups(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      dim: Int = 64,
      planes: Int = 12,
      tables: Int = 4,
      bruteForce: Boolean = false): DataFrame = {
    import graft.similarity.Similarity
    val base = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val pairs =
      if (bruteForce) {
        val a = base.select(col("id").as("id_a"), col("v").as("v_a"))
        val b = base.select(col("id").as("id_b"), col("v").as("v_b"))
        a.join(b, col("id_a") < col("id_b"))
      } else {
        val sigs = base.withColumn(
          "bucket",
          explode(Similarity.hyperplaneBuckets(col("v"), dim = dim,
            planes = planes, tables = tables)))
        val a = sigs.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
        val b = sigs.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
        a.join(b, Seq("bucket"))
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("v_a"), col("id_b"), col("v_b"))
          .distinct()
      }
    pairs
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
