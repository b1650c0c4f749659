package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** On-corpus multinomial Naive Bayes over hashed unigram bins — the
  * train-a-model-on-the-data-itself classifier a curation pipeline
  * uses where the heuristic gates stop (CCNet trains fastText on its
  * own shards for language/quality the same way; cf. Wenzek et al.
  * 2020). Training IS counting, which is why this is the classifier
  * to run at 100 TB: the "fit" is one explode + one keyed count per
  * class — no gradient loop, no driver state — and it is exactly
  * reproducible in any engine (md5 binning, closed-form smoothing),
  * so unlike an SGD model the full train+predict pipeline is
  * oracle-checkable.
  *
  * Model: P(class) prior + Laplace-smoothed P(bin|class); prediction
  * is argmax over classes of log prior + Σ_tokens log P(bin|class).
  * The model table is (classes × occupied bins) rows — a few thousand
  * — broadcast back for scoring, so the corpus shuffles only
  * (doc, class, partial-sum) rows with map-side combine. Scores are
  * rounded before the argmax (class label as tiebreak) to keep the
  * prediction independent of float summation order.
  */
object NaiveBayes {

  /** (class, bin, log-likelihood) + log-prior model, trained from
    * `labeled` (labelCol, textCol). Bins are [[Dsir.tokenBucket]]
    * md5 bins.
    */
  def fit(labeled: DataFrame, labelCol: String, textCol: String,
          buckets: Int = 1024): DataFrame = {
    val binned = labeled
      .select(col(labelCol).as("class"), explode(split(lower(col(textCol)), " ")).as("w"))
      .select(col("class"), Dsir.tokenBucket(col("w"), buckets).as("b"))
    val counts = binned.groupBy("class", "b").agg(count(lit(1)).as("n"))
    // per-class token totals and doc priors are class-count-sized
    val classTotals = counts.groupBy("class").agg(sum(col("n")).as("ct"))
    val priors = labeled.groupBy(col(labelCol).as("class")).agg(count(lit(1)).as("docs"))
    val nDocs = labeled.agg(count(lit(1)).as("nd"))
    counts
      .join(classTotals, "class")
      .join(priors, "class")
      .crossJoin(broadcast(nDocs))
      .select(col("class"), col("b"),
        log((col("n") + lit(1.0)) / (col("ct") + lit(buckets.toDouble))).as("loglik"),
        log(col("docs").cast("double") / col("nd")).as("logprior"),
        // unseen-bin likelihood for this class: Laplace mass only
        log(lit(1.0) / (col("ct") + lit(buckets.toDouble))).as("logmiss"))
  }

  /** Per-(doc, class) log-posterior scores — the full score table
    * [[predict]] argmaxes over, exposed because noise auditing
    * ([[labelNoise]]) needs the given-label score too, not just the
    * winner.
    */
  def scores(docs: DataFrame, model: DataFrame, idCol: String, textCol: String,
             buckets: Int = 1024): DataFrame = {
    val binned = docs
      .select(col(idCol).as("id"), explode(split(lower(col(textCol)), " ")).as("w"))
      .select(col("id"), Dsir.tokenBucket(col("w"), buckets).as("b"))
    // (doc, bin, count) first: the class cross then multiplies distinct
    // bins per doc, not raw tokens, and the model side is broadcast;
    // left_outer keeps bins a class never saw (scored with its
    // unseen-bin mass).
    val docBins = binned.groupBy("id", "b").agg(count(lit(1)).as("cnt"))
    val classes = model.select("class", "logprior", "logmiss").distinct()
    docBins
      .crossJoin(broadcast(classes))
      .join(broadcast(model.select("class", "b", "loglik")), Seq("class", "b"), "left_outer")
      .select(col("id"), col("class"), col("logprior"),
        (col("cnt") * coalesce(col("loglik"), col("logmiss"))).as("ll"))
      .groupBy("id", "class")
      .agg((first(col("logprior")) + sum(col("ll"))).as("score"))
  }

  /** argmax-class prediction for every document. The per-class score
    * sums the model log-likelihood for present bins and the class's
    * unseen-bin mass for the rest; rounded to 4 before the argmax so
    * the decision is engine-exact (ties break on class label).
    */
  def predict(docs: DataFrame, model: DataFrame, idCol: String, textCol: String,
              buckets: Int = 1024): DataFrame = {
    // min_by on (-score, class): highest rounded score wins, ties go
    // to the smallest class label — engine-exact argmax
    scores(docs, model, idCol, textCol, buckets)
      .groupBy("id")
      .agg(min_by(struct(col("class"), round(col("score"), 4).as("score")),
        struct((-round(col("score"), 4)).as("ns"), col("class"))).as("best"))
      .select(col("id"), col("best.class").as("predicted"), col("best.score").as("score"))
  }

  /** Label-noise gate in the confident-learning family (Northcutt,
    * Jiang & Chuang 2021, margin-simplified): train the classifier on
    * the corpus's OWN labels, then flag every document whose argmax
    * class beats its given label by at least `margin` log-odds — the
    * documents whose labels the data itself confidently contradicts,
    * the curation step before trusting per-label mixtures or
    * stratified samples. Margin over 4dp-rounded scores keeps the
    * decision engine-exact (full CL's probability thresholds would
    * softmax these scores; the log-odds margin needs no normalization
    * and no extra pass).
    *
    * Shape: [[scores]]' (doc, class) table twice — given-label row via
    * an equi-join on the label, argmax row via the predict min_by —
    * both id-keyed; nothing new shuffles beyond the score table.
    */
  def labelNoise(labeled: DataFrame, idCol: String, labelCol: String, textCol: String,
                 margin: Double, buckets: Int = 1024): DataFrame = {
    val model = fit(labeled, labelCol, textCol, buckets)
    val sc = scores(labeled, model, idCol, textCol, buckets)
      .withColumn("score", round(col("score"), 4))
    val best = sc.groupBy("id")
      .agg(min_by(struct(col("class"), col("score")),
        struct((-col("score")).as("ns"), col("class"))).as("best"))
      .select(col("id"), col("best.class").as("predicted"), col("best.score").as("s_pred"))
    val given = labeled.select(col(idCol).as("id"), col(labelCol).as("label"))
      .join(sc.withColumnRenamed("class", "label"), Seq("id", "label"))
      .withColumnRenamed("score", "s_given")
    given.join(best, "id")
      .withColumn("noise_margin", round(col("s_pred") - col("s_given"), 4))
      .filter(col("predicted") =!= col("label") && col("noise_margin") >= margin)
      .select(col("id"), col("label"), col("predicted"), col("noise_margin"))
  }
}
