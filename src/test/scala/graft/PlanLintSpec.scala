package graft

import org.apache.spark.sql.catalyst.plans.logical

/** Automated scale lint over the ENTIRE SparkEntry query surface: every
  * query's optimized plan is checked for the two patterns that are
  * correct at test scale and fatal at 100 TB —
  *
  *   1. unpartitioned windows (all rows to ONE task; the t12/t13 class
  *      of bug this repo already fixed once), and
  *   2. cartesian/nested-loop joins that are not a deliberate,
  *      broadcast-bounded design (the s01 exact baseline is the one
  *      allowed case: |probes| is fixed and broadcast).
  *
  * Plans are analyzed without executing the query, so the sweep stays
  * cheap; queries whose CONSTRUCTION runs jobs (fixture bootstrap,
  * index fits, oracle dumps) still pay only that bootstrap.
  */
class PlanLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // deliberate nested-loop/cartesian shapes, each justified in-source:
  // s01/s02/s03 broadcast a fixed probe set against candidates; t15 and
  // t14 cross-join a ONE-ROW broadcast denominator; d04 is the
  // documented brute-force exhaustive variant whose oracle replays it
  // (s02's LSH buckets are the scale path).
  // q65 joins a |event_types|-row sketch table to itself on an
  // inequality — deliberately tiny at any corpus scale. t19 crosses a
  // ONE-ROW broadcast (N, avgdl) stats frame like t14/t15.
  // s07 reuses the s01 broadcast-probe candidate stage before its
  // per-query greedy, so it inherits the same justified shape.
  private val allowNestedLoop =
    Set("s01_cosine_topk", "s02_lsh_ann_topk", "s03_ivf_topk",
      "t15_mixture_weights", "t14_tfidf_terms", "d04_embedding_neardups",
      "q65_kmv_setops", "t19_bm25", "s06_quant_ann", "s07_mmr_rerank",
      "t27_stopwords")

  test("no query plans an unpartitioned window or an unjustified cartesian join") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan
      val badWindows = plan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty => w
      }
      if (badWindows.nonEmpty)
        failures += s"$name: ${badWindows.size} unpartitioned window(s)"
      val phys = df.queryExecution.sparkPlan.toString
      val nestedLoop = phys.contains("CartesianProduct") ||
        phys.contains("BroadcastNestedLoopJoin")
      if (nestedLoop && !allowNestedLoop(name))
        failures += s"$name: cartesian/nested-loop join"
    }
    assert(failures.isEmpty,
      s"scale lint failed:\n  ${failures.mkString("\n  ")}")
  }
}
