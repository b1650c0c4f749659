package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.VectorOps
import graft.sources.Tables

/** Dev probe for the round-12 scale-proof of the sign-bucket embedding
  * family: measures nearDupPairs and semanticDedup at FIXED planes=8
  * vs count-scaled planesFor(n) on one sf dir, interleaved A/B/A/B so
  * host weather hits both configs equally, and prints the in-bucket
  * candidate-pair counts + max occupancy that explain the timings.
  *
  *   SPARK_GRAFT_CPUS=32 java -Xmx96g -cp ... \
  *     graft.tools.PlanesAB benchdata/sf3 [runs-per-config]
  */
object PlanesAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption
      .flatMap(a => scala.util.Try(a.toInt).toOption.filter(_ > 0)).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables(spark, dir).embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val variants = e.filter(col("id") % 10 === 0)
      .select((col("id") + 1000000).as("id"), transform(col("vec"), x => x * 1.5f).as("vec"))
    val corpus = e.unionByName(variants)
    val n = corpus.count()
    val scaled = VectorOps.planesFor(n)
    println(s"[planesAB] $dir corpus n=$n planes: fixed=8 scaled=$scaled")

    def occupancy(planes: Int): Unit = {
      val hp = VectorOps.hyperplanes(planes, 64)
      val row = corpus.select(VectorOps.lshBucket(col("vec"), hp).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("buckets"), max(col("c")).as("max_occ"),
          sum(col("c") * (col("c") - 1) / 2).as("cand_pairs"))
        .head()
      // Post-slab candidates: the pairs the projection-slab stencil
      // actually scores — the structural number the wall time follows
      // (bucket_pairs is what a slab-less join would score).
      val hp2 = VectorOps.hyperplanes(planes + 2, 64)
      val w = math.sqrt(64) * math.sqrt(2.0 - 2.0 * 0.99) * (1.0 + 1e-9)
      val b = corpus.select(col("id"),
        VectorOps.lshBucket(col("vec"), hp2.take(planes)).as("bucket"),
        floor(VectorOps.dot(col("vec"), typedlit(hp2(planes))) /
          (VectorOps.l2norm(col("vec")) * lit(w))).cast("long").as("c1"),
        floor(VectorOps.dot(col("vec"), typedlit(hp2(planes + 1))) /
          (VectorOps.l2norm(col("vec")) * lit(w))).cast("long").as("c2"))
      val xs = b
        .withColumn("d1", explode(typedlit(Seq(-1, 0, 1))))
        .withColumn("d2", explode(typedlit(Seq(-1, 0, 1))))
        .select(col("id"), col("bucket"),
          (col("c1") + col("d1")).as("c1"), (col("c2") + col("d2")).as("c2"))
      val postSlab = xs.as("x").join(b.as("y"), Seq("bucket", "c1", "c2"))
        .filter(col("x.id") < col("y.id")).count()
      println(s"[planesAB] planes=$planes buckets=${row.getLong(0)} " +
        s"max_occ=${row.getLong(1)} bucket_pairs=${row.getDouble(2).toLong} " +
        s"postslab_pairs=$postSlab")
    }
    occupancy(8)
    occupancy(scaled)

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "nearDupPairs" -> (p => VectorOps.nearDupPairs(corpus, threshold = 0.99, planes = p, dim = 64)),
      "semanticDedup" -> (p => VectorOps.semanticDedup(corpus, planes = p, dim = 64, tau = 0.99)))
    for ((opName, op) <- ops) {
      noop(op(8)); noop(op(scaled)) // warm both configs untimed
      val (ta, tb) = (Array.ofDim[Double](runs), Array.ofDim[Double](runs))
      for (i <- 0 until runs) { // strict interleave: weather hits both
        ta(i) = time(noop(op(8)))
        tb(i) = time(noop(op(scaled)))
      }
      def med(xs: Array[Double]): Double = xs.sorted.apply(xs.length / 2)
      println(f"[planesAB] $opName%-14s fixed8=${med(ta)}%.2fs scaled($scaled)=${med(tb)}%.2fs " +
        s"runs: fixed=${ta.map(t => f"$t%.2f").mkString(",")} scaled=${tb.map(t => f"$t%.2f").mkString(",")}")
    }

    // lshTopK sweep (round-13 verdict item 4): the last fixed-planes
    // sign-LSH consumer. Scaling planes shrinks each probe's candidate
    // bucket (the scale knob) but single-band collision probability
    // falls with planes, so recall vs exact brute force is measured
    // alongside wall — including multi-probe compensation, the knob
    // lshTopK already carries for exactly this trade.
    val probes = e.filter(col("id") % 20 === 0 && col("id") < 20000)
    val exact = VectorOps.bruteForceTopK(probes, e, 3)
      .select(col("probe_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    def lshCfg(p: Int, mp: Int): DataFrame =
      VectorOps.lshTopK(probes, e, 3, planes = p, dim = 64, multiProbe = mp)
        .select(col("probe_id"), col("neighbor_id"))
    val cfgs = Seq((8, 0), (scaled, 0), (scaled, scaled - 8), (scaled, scaled))
      .distinct.filter { case (p, mp) => mp >= 0 && mp <= p }
    for ((p, mp) <- cfgs) {
      noop(lshCfg(p, mp))
      val ts = (1 to runs).map(_ => time(noop(lshCfg(p, mp)))).sorted
      val hits = exact.join(lshCfg(p, mp), Seq("probe_id", "neighbor_id"), "left_semi").count()
      val emitted = lshCfg(p, mp).count()
      println(f"[planesAB] lshTopK planes=$p%-2d multiProbe=$mp%-2d med=${ts(ts.length / 2)}%.2fs " +
        f"recall=${hits.toDouble / nExact}%.3f emitted=$emitted (exact=$nExact)")
    }
    exact.unpersist()
    spark.stop()
  }
}
