package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor (SURVEY.md §2 #37 scale
  * path): a k-means coarse quantizer partitions the corpus into nlist
  * inverted lists; probes search only the nprobe nearest lists.
  *
  * Scale shape: centroids are tiny (nlist × dim floats) and live on
  * the driver/broadcast as literal expressions — the corpus is scored
  * against them in one codegen'd projection, never collected. Corpus
  * assignment shuffles once on list id; each probe joins against
  * nprobe lists instead of the full corpus, cutting candidates by
  * ~nlist/nprobe.
  */
object Ivf {

  /** Nearest-centroid id (argmin of L2^2 distance ≡ argmax of
    * dot - |c|²/2 for unit-free ranking; we use true distance).
    */
  private def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cd = typedlit(c)
      // |v - c|^2 = |v|^2 - 2 v·c + |c|^2; |v|^2 constant per row -> rank by |c|^2 - 2 v·c
      val d = lit(c.map(x => x * x).sum) - lit(2.0) * VectorOps.dot(vec, cd)
      struct(d.as("d"), lit(i).as("cid"))
    }
    least(scored: _*).getField("cid")
  }

  /** Lloyd iterations with deterministic seeding (first k rows by id).
    * Centroids come back to the driver each iteration — k × dim
    * doubles, bounded and tiny.
    *
    * The fit runs on a bounded SAMPLE of the corpus (≤
    * `fitSampleTarget` rows, deterministic seed), persisted across
    * iterations: k-means quality needs a representative subset, not
    * every row, so the per-iteration posexplode (a ×dim row blowup)
    * never touches the full corpus — at 100 TB the fit cost is
    * constant while only the single-projection ASSIGNMENT pass scales
    * with the data.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
      fitSampleTarget: Long = 20000L): Seq[Seq[Double]] = {
    // No corpus.count() pre-pass: deriving an exact sample fraction
    // would spend a complete corpus scan before the fit even starts.
    // Instead: constant-rate Bernoulli thinning (seeded, so the fit
    // set is stable across runs) capped by LIMIT — the limit's scan
    // stops as soon as fitSampleTarget rows surface, so fit cost is
    // bounded regardless of corpus size. The cap takes rows from the
    // leading partitions; a coarse quantizer needs a representative
    // spread, not a uniform sample, and the thinning decorrelates the
    // prefix from row order within those partitions (training the
    // quantizer on a bounded prefix is standard IVF practice).
    var fit = corpus
      .select(col("id"), col("vec"))
      .sample(withReplacement = false, fraction = 0.5, seed = 42L)
      .limit(fitSampleTarget.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var seeds = fit.orderBy("id").limit(k)
        .select(col("vec")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
      // Small-corpus guard, detected for free off the seed collect: if
      // the 0.5-thinned fit set can't even seed k centroids, refit on
      // the unsampled corpus (still LIMIT-capped) — otherwise a corpus
      // below ~2k rows would silently produce fewer lists than nlist.
      if (seeds.length < k) {
        fit.unpersist(false)
        fit = corpus.select(col("id"), col("vec")).limit(fitSampleTarget.toInt)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        seeds = fit.orderBy("id").limit(k)
          .select(col("vec")).collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
      }
      var centroids: Seq[Seq[Double]] = seeds
      for (_ <- 0 until iters) {
        val assigned = fit.select(nearestCentroid(col("vec"), centroids).as("cid"), col("vec"))
        val next = assigned
          .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg(avg("x").as("m"))
          .groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), s => s.getField("m")).as("c"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
          .toMap
        centroids = centroids.indices.map(i => next.getOrElse(i, centroids(i)))
      }
      centroids
    } finally { fit.unpersist(false); () }
  }

  /** Top-`nprobe` centroid ids for a vector. */
  private def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      val d = lit(c.map(x => x * x).sum) - lit(2.0) * VectorOps.dot(vec, typedlit(c))
      struct(d.as("d"), lit(i).as("cid"))
    }: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cid"))
  }

  /** IVF search: probes/corpus are (id, vec); returns top-k cosine
    * neighbors per probe among the nprobe nearest inverted lists.
    */
  def topK(probes: DataFrame, corpus: DataFrame, k: Int, nlist: Int, nprobe: Int, iters: Int = 2): DataFrame = {
    val centroids = kmeansCentroids(corpus, nlist, iters)
    val lists = corpus.select(
      col("id").as("neighbor_id"), col("vec").as("nv"),
      VectorOps.l2norm(col("vec")).as("nn"),
      nearestCentroid(col("vec"), centroids).as("cid"))
    val pr = probes.select(
      col("id").as("probe_id"), col("vec").as("pv"),
      VectorOps.l2norm(col("vec")).as("pn"),
      explode(nearestCentroids(col("vec"), centroids, nprobe)).as("cid"))
    val scored = lists.join(broadcast(pr), "cid")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (VectorOps.dot(col("pv"), col("nv")) / (col("pn") * col("nn"))).as("sim"))
    TopK.perKey(scored, Seq("probe_id"), struct(-col("sim"), col("neighbor_id")), k)
  }
}
