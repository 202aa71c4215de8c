package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Registry, TextFunctions}

/** Model-based quality filtering — the second tier of corpus curation
  * after the heuristic gates (TextAnalysis.qualitySignals t2, Gopher
  * rules t7): train a linear classifier to separate a curated "good"
  * cohort from raw corpus text, then keep documents the model scores
  * above a threshold. This is the standard web-scale recipe (a cheap
  * linear model over hashed token counts; GPT-3/CCNet-style curated-vs-
  * crawl discrimination), expressed Spark-first:
  *
  *  - features are [[HashingTF]] over the SAME whitespace tokenization
  *    as every other text operator (TextFunctions.wsTokens) — hashed,
  *    fixed-width, no vocabulary state to ship;
  *  - training runs on a (small, labeled) cohort; at 100 TB you train
  *    on thousands of rows and SCORE billions, so the expensive side is
  *    scoring, which is a broadcast-coefficient dot product per row —
  *    pure map-side, no shuffle (plan-asserted in the spec);
  *  - deterministic: HashingTF is stateless, logistic regression on a
  *    fixed dataset converges to the same coefficients.
  *
  * No DuckDB oracle: an LBFGS fixpoint has no SQL twin (same status as
  * [[Clustering]]); the spec pins held-out accuracy, determinism, the
  * map-side scoring plan, and the filter contract instead.
  */
object QualityClassifier {

  /** (tokenizer + hasher) shared by train and score — one definition so
    * the two sides can never disagree on the feature space. */
  private def featurize(docs: DataFrame, textCol: String,
                        numFeatures: Int): DataFrame = {
    val withToks = docs.withColumn("_toks",
      Registry.wsLowerTokens(col(textCol)))
    new HashingTF().setInputCol("_toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(withToks).drop("_toks")
  }

  /** Train on a labeled cohort (`labelCol` ∈ {0.0, 1.0}; 1 = keep-worthy
    * text). `regParam` keeps the hashed weights from overfitting the
    * small curated cohort. */
  def train(labeled: DataFrame, textCol: String = "text",
            labelCol: String = "label", numFeatures: Int = 1 << 12,
            maxIter: Int = 50, regParam: Double = 0.01): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(featurize(labeled, textCol, numFeatures))

  /** Score every document: adds `quality_prob` = P(label=1 | text).
    * Map-side — the model's coefficient vector rides the closure, the
    * probability is one sparse dot product per row. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            textCol: String = "text"): DataFrame = {
    val secondProb = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    // configure a COPY: setters on the caller's model would be a visible
    // side effect on a shared object (concurrent scorers with different
    // column configs would interfere)
    val scorer = model.copy(org.apache.spark.ml.param.ParamMap.empty)
    scorer.setFeaturesCol("features").setProbabilityCol("_prob")
      .setPredictionCol("_pred").setRawPredictionCol("_raw")
      .transform(featurize(docs, textCol, model.numFeatures))
      .withColumn("quality_prob", secondProb(col("_prob")))
      .drop("features", "_prob", "_pred", "_raw")
  }

  /** The curation gate: keep documents scoring ≥ `minProb`. */
  def filterByQuality(model: LogisticRegressionModel, docs: DataFrame,
                      minProb: Double, textCol: String = "text"): DataFrame =
    score(model, docs, textCol).where(col("quality_prob") >= minProb)

  /** MULTICLASS form — the same linear-over-hashed-features family as
    * the binary gate, trained one-vs-rest style via Spark ML's
    * multinomial LR (softmax over K weight vectors; the
    * gradient-trained sibling of [[LangId]]'s closed-form NB — use
    * LangId when an exact oracle matters, this when max-margin
    * accuracy does). `labelCol` holds STRING classes (e.g. languages);
    * the label index is the deterministic sorted-distinct order, so
    * retraining on the same cohort is reproducible. Returns the model
    * plus that class order for [[predictLabel]]. */
  def trainMulticlass(labeled: DataFrame, labelCol: String = "lang",
                      textCol: String = "text", numFeatures: Int = 1 << 12,
                      maxIter: Int = 50, regParam: Double = 0.01)
      : (LogisticRegressionModel, Seq[String]) = {
    val labels = labeled.select(col(labelCol).cast("string").as("_l"))
      .distinct().orderBy(col("_l")).collect().map(_.getString(0)).toSeq
    require(!labels.contains(null),
      s"trainMulticlass: NULL values in label column '$labelCol' — " +
        "filter or impute labels before fitting")
    val idx = labels.zipWithIndex.toMap
    // loud failure on a label outside the training class order (a
    // bare idx(s) would NPE/NoSuchElement deep inside a task with no
    // hint which value broke)
    val toIdx = udf((s: String) => idx.get(s) match {
      case Some(i) => i.toDouble
      case None => throw new IllegalArgumentException(
        s"trainMulticlass: unexpected label '$s' in column '$labelCol' " +
          s"(training classes: ${labels.mkString(", ")})")
    })
    val model = new LogisticRegression()
      .setFamily("multinomial")
      .setFeaturesCol("features").setLabelCol("_li")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(featurize(
        labeled.withColumn("_li", toIdx(col(labelCol).cast("string"))),
        textCol, numFeatures))
    (model, labels)
  }

  /** Map-side multiclass scoring: adds `pred_label` (the argmax class
    * mapped back through the training class order). The K×F
    * coefficient matrix rides the closure — one broadcast, one dense
    * dot per class per row, no shuffle (plan-asserted in the spec,
    * same contract as [[score]]). */
  def predictLabel(model: LogisticRegressionModel, labels: Seq[String],
                   docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scorer = model.copy(org.apache.spark.ml.param.ParamMap.empty)
    scorer.setFeaturesCol("features").setProbabilityCol("_prob")
      .setPredictionCol("_pred").setRawPredictionCol("_raw")
      .transform(featurize(docs, textCol, model.numFeatures))
      .withColumn("pred_label",
        element_at(array(labels.map(lit): _*), col("_pred").cast("int") + 1))
      .drop("features", "_prob", "_pred", "_raw")
  }
}
