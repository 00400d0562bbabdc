package graft

import org.apache.spark.sql.functions._

import graft.load.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join results on skewed data") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val small = Seq(("hot", 100), ("k1", 1), ("k2", 2)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(big, small, "k", salt = 8)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == "hot") == 100)
  }

  test("topNPerKey equals the plain rank-window formulation") {
    val df = (1 to 500).map(i => (s"k${i % 7}", i)).toDF("k", "v")
      .repartition(8)
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
      df.withColumn("r", row_number().over(w)).where(col("r") <= 3)
        .select("k", "v").collect().map(_.toSeq).toSet
    }
    val got = Scale.topNPerKey(df, "k", col("v").desc, 3)
      .select("k", "v").collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    // a crashed earlier run can leave the managed location behind
    Seq("bkt_a", "bkt_b").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    Scale.writeBucketed((1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "a"),
      "bkt_a", "id", 4)
    Scale.writeBucketed((500 to 1500).map(i => (i.toLong, s"b$i")).toDF("id", "b"),
      "bkt_b", "id", 4)
    // force the sort-merge path (tiny test tables would broadcast, which
    // bypasses bucketing entirely); at scale SMJ is what bucketing serves
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      assert(joined.count() == 501)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("q23_bucketed_join plans with zero exchanges end-to-end") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.queries.Relational.queries("q23_bucketed_join")(spark, dir)
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected zero-exchange bucketed join+agg, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
