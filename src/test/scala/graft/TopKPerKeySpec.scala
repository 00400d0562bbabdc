package graft

import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKey, TopKPerKeyExec}

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("custom TopKPerKey operator equals the rank-window formulation on real data") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    // total order: price desc, then the unique (orderkey, linenumber)
    val ord = Seq(col("l_extendedprice").desc,
      col("l_orderkey").asc, col("l_linenumber").asc)
    val custom = TopKPerKey(li, Seq("l_suppkey"), ord, k = 3)
      .collect().map(_.toSeq).toSet
    val window = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey")).orderBy(ord: _*)
      li.withColumn("__r", row_number().over(w)).where(col("__r") <= 3)
        .drop("__r").collect().map(_.toSeq).toSet
    }
    assert(custom === window)
    assert(custom.nonEmpty)
  }

  test("TopKPerKey plans as partial heap -> one exchange -> final heap") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val df = TopKPerKey(li, Seq("l_suppkey"),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), k = 3)
    df.collect()
    // the final adaptive plan wraps stages, so assert on its rendering
    // (and only the Final Plan section — the Initial Plan repeats it)
    val planStr = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("TopKPerKeyPartial".r.findAllIn(planStr).length === 1, s"plan:\n$planStr")
    assert("TopKPerKeyFinal".r.findAllIn(planStr).length === 1, s"plan:\n$planStr")
    // exactly one shuffle, inserted by EnsureRequirements between them
    assert("Exchange hashpartitioning".r.findAllIn(planStr).length === 1,
      s"expected exactly one hash exchange, got:\n$planStr")
    val partialIdx = planStr.indexOf("TopKPerKeyPartial")
    val finalIdx = planStr.indexOf("TopKPerKeyFinal")
    assert(finalIdx < partialIdx, "final must sit above partial in the tree")
  }

  test("partial-pass key-map flush keeps results exact at a tiny key bound") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val ord = Seq(col("l_extendedprice").desc,
      col("l_orderkey").asc, col("l_linenumber").asc)
    val window = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey")).orderBy(ord: _*)
      li.withColumn("__r", row_number().over(w)).where(col("__r") <= 3)
        .drop("__r").collect().map(_.toSeq).toSet
    }
    // maxPartialKeys=2 forces constant flushing of the partial heap map
    // (hundreds of supplier keys per partition) — the hyper-cardinality
    // memory-bound path; results must not change
    spark.conf.set("spark.graft.topk.maxPartialKeys", "2")
    try {
      val flushed = TopKPerKey(li, Seq("l_suppkey"), ord, k = 3)
        .collect().map(_.toSeq).toSet
      assert(flushed === window)
      assert(flushed.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.maxPartialKeys")
  }

  test("partial pass bounds what crosses the exchange") {
    // 1000 rows, ONE key, k=2, 4 input partitions: the final stage must
    // see at most 4 partitions x 2 rows = 8 rows, not 1000
    val df = spark.range(1000).repartition(4)
      .select(lit("hot").as("k"), col("id"), (col("id") % 97).as("v"))
    val top = TopKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), k = 2)
    val rows = top.collect()
    assert(rows.length === 2)
    // ground truth: v = 96 at the two smallest ids with id % 97 == 96
    val expect = (0L until 1000L).map(i => (i % 97, i)).sortBy { case (v, i) => (-v, i) }
      .take(2).map(_._2).toSet
    assert(rows.map(_.getLong(1)).toSet === expect)
    // the shuffle between partial and final must carry at most
    // 4 partitions x k rows, not the 1000 inputs — read the exchange's
    // dataSize/numRows metrics from the executed adaptive plan
    val shuffleRows = {
      var found = -1L
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          // only the requirement-inserted exchange above the partial
          // stage — the repartition(4) shuffle also appears in this plan
          // and legitimately carries all 1000 rows
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if e.shuffleOrigin ==
                org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS =>
            e.metrics.get("numOutputRows").orElse(e.metrics.get("shuffleRecordsWritten"))
              .foreach(m => found = m.value)
          case _ =>
        }
        p.children.foreach(walk)
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ =>
        }
      }
      walk(top.queryExecution.executedPlan)
      found
    }
    assert(shuffleRows >= 0, "no shuffle metric found")
    assert(shuffleRows <= 8, s"partial pass leaked $shuffleRows rows across the exchange")
  }
}
