package graft

import org.apache.spark.sql.functions._

import graft.text.QualityClassifier

/** The t38 model must actually LEARN, not just reproduce: unigram
  * vocabularies separate languages, so a working fit classifies far
  * above the base rate. Also pins the driver-side bucket/tokenizer
  * twins against the engine's (hash parity is what makes fit-time
  * features and apply-time features the same features).
  */
class QualityClassifierSpec extends SparkSpec {

  test("driver-side bucket matches the engine's hash64 % 1024") {
    import spark.implicits._
    val toks = Seq("alpha", "Beta", "gamma7", "日本語", "x")
    val engine = toks.toDF("tok")
      .select(col("tok"),
        pmod(graft.functions.KmvSketch.hash64(col("tok")), lit(1024L)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(QualityClassifier.bucket(t).toLong == engine(t), s"token $t")
    }
  }

  test("t38 distills the stopword rule with high held-out fidelity") {
    val out = graft.queries.Corpus.t38_quality_classifier(
      spark, "/root/testdata/sf0.01").collect()
    // columns: doc_id, logit, pred_high_stop, label_high_stop
    val all = out.map(r => (r.getBoolean(3), r.getBoolean(2)))
    val acc = all.count { case (y, p) => y == p }.toDouble / all.length
    val baseRate = {
      val pos = all.count(_._1).toDouble / all.length
      math.max(pos, 1 - pos)
    }
    assert(acc >= 0.9 && acc > baseRate,
      s"distillation accuracy $acc (base rate $baseRate)")
    // the 300 docs with id >= 200 were never seen by the fit: held-out
    // fidelity specifically
    val held = out.filter(_.getLong(0) >= 200)
      .map(r => (r.getBoolean(3), r.getBoolean(2)))
    val hAcc = held.count { case (y, p) => y == p }.toDouble / held.length
    assert(hAcc >= 0.85, s"held-out accuracy $hAcc")
  }
}
