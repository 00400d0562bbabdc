package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity


object RecallGrid {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(probes, e, "vec_id", "embedding", "vec_id", "embedding", 10).cache()
    exact.count()
    for ((pl, tb) <- Seq((8,8),(6,12),(5,16),(4,16),(4,24),(3,24))) {
      val lsh = Similarity.lshTopK(probes, e, "vec_id", "embedding", "vec_id", "embedding", 10, 64, pl, tb)
      // candidate count estimate: distinct candidate pairs
      println(f"LSH planes=$pl tables=$tb recall=${Similarity.recallAtK(exact, lsh)}%.3f")
    }
    for (np <- Seq(4, 6, 8, 10)) {
      val ivf = Similarity.ivfTopK(probes, e, "vec_id", "embedding", "vec_id", "embedding", 10, 16, np)
      println(f"IVF nLists=16 nProbe=$np recall=${Similarity.recallAtK(exact, ivf)}%.3f")
    }
    spark.stop()
  }
}
