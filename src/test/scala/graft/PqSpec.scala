package graft

import org.apache.spark.sql.functions._

import graft.similarity.{PqCodebook, Similarity}

/** Product-quantization contract: codebook geometry, encode
  * determinism, ADC ranking quality, and the compression claim.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("fit/encode: m codes per vector, every code in [0, k)") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = PqCodebook.fit(e, "embedding", m = 16, k = 16)
    assert(cb.m == 16 && cb.k == 16 && cb.subDim == 4 && cb.dim == 64)
    val codes = e.select(cb.encode(col("embedding")).as("c"))
    val bad = codes.where(size(col("c")) =!= 16 ||
      exists(col("c"), x => x < 0 || x >= 16))
    assert(bad.count() == 0, "an encoded vector left the m x [0,k) domain")
  }

  test("encode is deterministic and reconstruction beats the zero baseline") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = PqCodebook.fit(e, "embedding", m = 16, k = 16)
    val once = e.select(col("vec_id"), cb.encode(col("embedding")).as("c"))
      .orderBy("vec_id").collect().toSeq
    val again = e.select(col("vec_id"), cb.encode(col("embedding")).as("c"))
      .orderBy("vec_id").collect().toSeq
    assert(once == again, "re-encoding the same corpus changed codes")

    // quantization must capture geometry: the mean squared
    // reconstruction error must be well below the mean squared norm
    // (the error of quantizing everything to zero)
    val books = cb.codebooks
    val stats = e.select(col("embedding").cast("array<double>").as("v"),
        cb.encode(col("embedding")).as("c"))
      .as[(Seq[Double], Seq[Int])].collect()
    var errSum = 0.0
    var normSum = 0.0
    stats.foreach { case (v, c) =>
      (0 until 16).foreach { j =>
        val ctr = books(j)(c(j))
        (0 until 4).foreach { i =>
          val d = v(j * 4 + i) - ctr(i)
          errSum += d * d
          normSum += v(j * 4 + i) * v(j * 4 + i)
        }
      }
    }
    info(f"PQ reconstruction error ratio ${errSum / normSum}%.3f")
    assert(errSum < 0.8 * normSum,
      f"PQ reconstruction no better than zero quantizer: ${errSum / normSum}%.3f")
  }

  test("native PqEncode equals the declarative argmin formulation") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = PqCodebook.fit(e, "embedding", m = 16, k = 16)
    val native = e.select(col("vec_id"), cb.encode(col("embedding")).as("c"))
      .orderBy("vec_id").collect().toSeq
    val declarative = e
      .select(col("vec_id"), cb.encodeDeclarative(col("embedding")).as("c"))
      .orderBy("vec_id").collect().toSeq
    assert(native == declarative,
      "native codegen encode diverged from the declarative reference")
  }

  test("s17 ADC + re-rank recall@10 vs exact ground truth is gated") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(
      probes, e, "vec_id", "embedding", "vec_id", "embedding", k = 10)
    val approx = graft.queries.Corpus.queries("s17_pq_ann")(spark, dir)
    val recall = Similarity.recallAtK(exact, approx)
    info(f"recall@10 pq(m=16,k=16,cand=40)=$recall%.3f")
    println(f"[recall] s17_pq_ann=$recall%.3f")
    assert(recall >= 0.8, f"PQ ANN recall regressed: $recall%.3f < 0.8")
  }

  test("s18 IVF-PQ composed recall@10 vs exact ground truth is gated") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.where(col("vec_id") >= 10 && col("vec_id") < 15)
    val exact = Similarity.bruteForceTopK(
      probes, e, "vec_id", "embedding", "vec_id", "embedding", k = 10)
    val approx = graft.queries.Corpus.queries("s18_ivfpq_ann")(spark, dir)
    val recall = Similarity.recallAtK(exact, approx)
    info(f"recall@10 ivfpq(nProbe=8,m=16,k=16,cand=80)=$recall%.3f")
    println(f"[recall] s18_ivfpq_ann=$recall%.3f")
    assert(recall >= 0.85, f"IVF-PQ recall regressed: $recall%.3f < 0.85")
  }
}
