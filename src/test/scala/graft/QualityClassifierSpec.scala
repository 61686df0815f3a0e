package graft

import graft.operators.{QualityWeights, TextAnalysis}
import graft.tools.QualityAugment
import org.apache.spark.sql.functions._

/** The model-based quality gate (`pipe_classifier_quality`):
  * (a) it AGREES with the rule-based Gopher teacher on the natural
  * corpus (the VERDICT bar is ≥ 90%; the fit measures ~98.6% on this
  * held-out decade), and (b) it REJECTS the planted adversarial class
  * the rules provably cannot catch — fluent-looking gibberish that
  * passes every Gopher bound but is made of tokens no quality corpus
  * produces. */
class QualityClassifierSpec extends SparkSpec {

  test("classifier agrees with the Gopher verdicts on >= 90% of held-out docs") {
    val pred = TextAnalysis.pipeClassifierQuality(spark, Sf)
      .select(col("doc_id"), col("keep").as("keep_pred"))
    val gate = TextAnalysis.pipeGopherGate(spark, Sf)
      .select(col("doc_id"), col("keep").as("keep_gate"))
    val joined = pred.join(gate, "doc_id").cache()
    try {
      val n = joined.count()
      val ok = joined.filter(col("keep_pred") === col("keep_gate")).count()
      assert(n > 0)
      val agree = ok.toDouble / n
      assert(agree >= 0.9, f"agreement $agree%.4f below 0.9 ($ok/$n)")
    } finally joined.unpersist()
  }

  test("planted gibberish passes every Gopher rule but the classifier rejects it") {
    import spark.implicits._
    // held-out seeds — QualityAugment.TrainSeeds ends at 1500, these
    // never entered the fit
    val planted = (5000L until 5008L).map(s => (s, QualityAugment.gibberishDoc(s)))
      .toDF("doc_id", "text")
    val gate = TextAnalysis.gopherGateFrame(planted).collect()
    assert(gate.length == 8)
    gate.foreach { r =>
      assert(r.getAs[Boolean]("keep"),
        s"doc ${r.getLong(0)}: adversarial premise broken — Gopher rejects it " +
          s"(reasons=${r.getAs[Long]("reasons")})")
    }
    val scored = TextAnalysis.classifierScoreFrame(planted)
      .select(col("doc_id"), col("keep_pred"), col("score")).collect()
    scored.foreach { r =>
      assert(!r.getAs[Boolean]("keep_pred"),
        s"doc ${r.getLong(0)}: classifier kept rule-passing gibberish " +
          s"(score=${r.getAs[Double]("score")})")
    }
  }

  test("a fluent natural document keeps under both gates") {
    // at least one doc both gates keep, and the rule-kept majority
    // stays kept (the classifier is a refinement, not a new regime)
    val pred = TextAnalysis.pipeClassifierQuality(spark, Sf)
      .select(col("doc_id"), col("keep").as("keep_pred"))
    val gate = TextAnalysis.pipeGopherGate(spark, Sf)
      .select(col("doc_id"), col("keep").as("keep_gate"))
    val both = pred.join(gate, "doc_id")
    val keptGate = both.filter(col("keep_gate")).count()
    val keptBoth = both.filter(col("keep_gate") && col("keep_pred")).count()
    assert(keptGate > 0)
    assert(keptBoth.toDouble / keptGate >= 0.9,
      s"classifier dropped ${keptGate - keptBoth} of $keptGate rule-kept docs")
  }

  test("score is the sign-consistent rounded logit and weights are frozen non-trivially") {
    // the placeholder all-zero weights would score every doc at the
    // bare bias — guard against shipping an unfit file
    assert(QualityWeights.W.count(_ != 0.0) > 100, "weights look unfit (placeholder?)")
    assert(QualityWeights.W.length == QualityWeights.D)
    assert(TextAnalysis.ClassifierDim == QualityWeights.D)
    val rows = TextAnalysis.pipeClassifierQuality(spark, Sf)
      .select(col("score"), col("keep")).collect()
    rows.foreach { r =>
      val s = r.getDouble(0)
      // keep derives from the UNROUNDED logit; at 4 decimals the two
      // can only disagree inside one rounding step of zero
      if (math.abs(s) > 5e-5)
        assert(r.getBoolean(1) == s > 0.0, s"keep/sign mismatch at score=$s")
    }
  }
}
