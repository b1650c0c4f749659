package graft

import org.apache.spark.sql.functions._

import graft.operators.{Layout, VectorOps}
import graft.plans.{Hilbert2, ZOrder2}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("ZOrder2.interleave matches hand-computed Morton codes and is bit-symmetric") {
    // x=0b101, y=0b011 at 3 bits: z bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1
    assert(ZOrder2.interleave(5L, 3L, 3) == 0x1BL)
    assert(ZOrder2.interleave(0L, 0L, 8) == 0L)
    // all-ones interleave fills every even (x) / odd (y) bit position
    assert(ZOrder2.interleave(0xFFL, 0L, 8) == 0x5555L)
    assert(ZOrder2.interleave(0L, 0xFFL, 8) == 0xAAAAL)
    // keys wider than `bits` contribute only their low bits
    assert(ZOrder2.interleave(0x1F0FL, 0L, 8) == ZOrder2.interleave(0x0FL, 0L, 8))
  }

  test("ZOrder2 expression evaluates via codegen identically to the Scala impl") {
    val df = spark.range(0, 512).select(
      (col("id") % 19).as("x"), (col("id") % 23).as("y"))
    val got = df.select(col("x"), col("y"), ZOrder2(col("x"), col("y"), 8).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder2.interleave(r.getLong(0), r.getLong(1), 8))
    }
  }

  test("Hilbert2.index is the canonical first-order curve, a bijection, and NEVER jumps") {
    // bits=1 base case: the U-shaped walk (0,0)→(0,1)→(1,1)→(1,0)
    assert(Hilbert2.index(0L, 0L, 1) == 0L)
    assert(Hilbert2.index(0L, 1L, 1) == 1L)
    assert(Hilbert2.index(1L, 1L, 1) == 2L)
    assert(Hilbert2.index(1L, 0L, 1) == 3L)
    // keys wider than `bits` contribute only their low bits
    assert(Hilbert2.index(0x1F05L, 0x03L, 4) == Hilbert2.index(0x05L, 0x03L, 4))

    // bits=4: bijection [0,16)² ↔ [0,256), and the defining locality
    // property Morton lacks — consecutive curve positions are ALWAYS
    // adjacent grid cells (|Δx| + |Δy| = 1), so contiguous row runs
    // cover tight bounding boxes with no diagonal jumps.
    val byD = (for (x <- 0 until 16; y <- 0 until 16)
      yield Hilbert2.index(x.toLong, y.toLong, 4) -> ((x, y))).toMap
    assert(byD.size == 256 && byD.keySet == (0L until 256L).toSet)
    (0L until 255L).foreach { d =>
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("Hilbert2 expression evaluates via codegen identically to the Scala impl") {
    val df = spark.range(0, 512).select(
      (col("id") % 19).as("x"), (col("id") % 23).as("y"))
    val got = df.select(col("x"), col("y"), Hilbert2(col("x"), col("y"), 8).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == Hilbert2.index(r.getLong(0), r.getLong(1), 8))
    }
  }

  test("z-order layout bounds BOTH dimensions per file where a single-key sort shreds one") {
    // Uniform grid: every (x, y) in [0,64)². Eight output files.
    val grid = spark.range(0, 64 * 64).select(
      (col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val files = 8

    // Per-file bounding boxes = what parquet footers would carry.
    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
      val withPid = df.select(col("x"), col("y"),
        org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      withPid.groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    }
    // Files a min-max-pruned point filter still has to read, averaged
    // over a probe grid.
    def meanHits(bs: Seq[(Long, Long, Long, Long)], onX: Boolean): Double = {
      val probes = Seq(3L, 17L, 33L, 47L, 60L)
      probes.map { v =>
        bs.count { case (x0, x1, y0, y1) =>
          if (onX) x0 <= v && v <= x1 else y0 <= v && v <= y1 }
      }.sum.toDouble / probes.size
    }

    val z = boxes(Layout.zorderLayout(grid, "x", "y", bits = 6, numFiles = files))
    val k = boxes(grid.repartitionByRange(files, col("x")).sortWithinPartitions("x"))

    // Single-key layout: perfect pruning on x, NO pruning on y — every
    // file's y-range is the full domain, so a y filter reads all 8.
    assert(meanHits(k, onX = false) == files.toDouble)
    // Z layout: a point filter on EITHER dimension prunes files.
    // Ideal 32×16 boxes give 4 (x) and 2 (y) hits; repartitionByRange
    // samples its bounds, so boxes straddle block boundaries — allow
    // ~65% but require BOTH axes to prune, and the two-axis total to
    // beat the single-key layout's (which pays 8 on every y filter).
    val (zx, zy) = (meanHits(z, onX = true), meanHits(z, onX = false))
    assert(zx <= files * 0.65, s"x-filter hits $zx of $files z-ordered files")
    assert(zy <= files * 0.65, s"y-filter hits $zy of $files z-ordered files")
    assert(zx + zy < meanHits(k, onX = true) + meanHits(k, onX = false),
      s"z total $zx+$zy not below single-key total")
  }

  test("decontaminateByEmbedding equals the brute-force max over the benchmark") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val bench = e.filter(col("id") % 10 === 0)
    val corpus = e.filter(col("id") % 10 =!= 0)
    // tau = the empirical median max-sim, so the gate provably fires
    // both ways regardless of the embedding distribution.
    val maxes = corpus.as("c").crossJoin(bench.as("b"))
      .select(col("c.id").as("id"),
        round(VectorOps.cosine(col("c.vec"), col("b.vec")), 6).as("sim"))
      .groupBy("id").agg(max("sim").as("m"))
      .collect().map(_.getDouble(1)).sorted
    val tau = maxes(maxes.length / 2)

    val got = VectorOps.decontaminateByEmbedding(corpus, bench, tau)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getBoolean(3))).toMap

    val brute = corpus.as("c").crossJoin(bench.as("b"))
      .select(col("c.id").as("id"),
        round(VectorOps.cosine(col("c.vec"), col("b.vec")), 6).as("sim"))
      .groupBy("id")
      .agg(max("sim").as("m"), sum(when(col("sim") >= tau, 1L).otherwise(0L)).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    assert(got.keySet == brute.keySet)
    got.foreach { case (id, (m, h, keep)) =>
      assert(m == brute(id)._1 && h == brute(id)._2 && keep == (m < tau))
    }
    // the gate actually fires both ways on real data
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("zCellRangeJoin equals the naive theta-join and its cover misses nothing") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_partkey", "l_suppkey")
    val m = li.agg(max(col("l_partkey")).as("xm"), max(col("l_suppkey")).as("ym"))
    val boxes = spark.range(0, 6).crossJoin(broadcast(m)).select(
      col("id").as("box_id"),
      ((col("id") * (col("xm") + 1L)) / 6L).cast("long").as("x0"),
      (((col("id") + 2L) * (col("xm") + 1L)) / 6L).cast("long").minus(1L).as("x1"),
      (((col("id") % 3L) * (col("ym") + 1L)) / 3L).cast("long").as("y0"),
      ((((col("id") % 3L) + 2L) * (col("ym") + 1L)) / 3L).cast("long").minus(1L).as("y1"))

    def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy("box_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val viaCells = counts(Layout.zCellRangeJoin(li, "l_partkey", "l_suppkey", boxes, level = 4))
    val naive = counts(li.crossJoin(boxes)
      .filter(col("l_partkey") >= col("x0") && col("l_partkey") <= col("x1") &&
        col("l_suppkey") >= col("y0") && col("l_suppkey") <= col("y1")))
    assert(viaCells == naive, "cell-cover join disagrees with naive theta join")
    assert(naive.values.sum > 0)
  }

  test("cluster split never separates a verified near-dup pair across splits") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val variants = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" extra tail token")).as("text"))
    val planted = docs.unionByName(variants)
    val pairs = graft.operators.TextDedup
      .minhashNearDupsPortable(planted, "doc_id", "text", h = 8, bands = 4)
    val cc = graft.operators.Graph
      .connectedComponentsAll(pairs, "id_a", "id_b", planted, "doc_id")
    val split = graft.operators.Sampling
      .assignSplit(cc, "component", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 11L)
      .select(col("id"), col("split"))
    val leaked = pairs
      .join(split.withColumnRenamed("split", "sa"), pairs("id_a") === split("id"))
      .drop("id")
      .join(split.withColumnRenamed("split", "sb"), pairs("id_b") === split("id"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(leaked == 0, s"$leaked near-dup pairs straddle splits")
    // and the planted twins give the test teeth: pairs exist at all
    assert(pairs.count() > 0)
  }

  test("psiDrift scores identical halves near zero and a shifted distribution high") {
    import org.apache.spark.sql.functions.{col, lit}
    // stable: old and new halves draw the same values; shifted: the
    // new half's values move up 3 bins
    val rows = (0 until 400).map { i =>
      val isNew = i % 2 == 1
      val stableVal = (i / 2) % 50
      val shiftedVal = if (isNew) (i / 2) % 50 + 30 else (i / 2) % 50
      (i.toLong, isNew, stableVal, shiftedVal)
    }
    val df = rows.toDF("id", "isnew", "stable", "shifted")
    def psiOf(c: String): Double = graft.operators.DataOps
      .psiDrift(df.withColumn("g", lit("s")), "g", col("isnew"), col(c), 10L, 10)
      .collect().head.getAs[Double]("psi")
    val stable = psiOf("stable")
    val shifted = psiOf("shifted")
    assert(stable < 0.01, s"identical halves scored PSI $stable")
    assert(shifted > 0.25, s"3-bin shift scored PSI $shifted — below the action threshold")
  }

  test("shard assignment is deterministic, total, and balanced") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bal = Layout.shardBalance(docs, "doc_id",
      size(split(col("text"), " ")).cast("long"), "source", nShards = 16)
      .collect()
    assert(bal.map(_.getLong(0)).toSet == (0L until 16L).toSet, "some shard is empty")
    assert(bal.map(_.getLong(1)).sum == docs.count())
    // md5 uniformity at 500 docs / 16 shards: every shard within 3x of even
    val shares = bal.map(_.getDouble(4))
    assert(shares.forall(s => s > 0.2 && s < 3.0), s"imbalanced: ${shares.mkString(",")}")
    // same seed → same assignment on re-run
    val again = Layout.shardBalance(docs, "doc_id",
      size(split(col("text"), " ")).cast("long"), "source", nShards = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bal.map(r => r.getLong(0) -> r.getLong(1)).toMap == again)
  }

  test("gridRadiusJoin equals the brute-force distance join, each pair once") {
    import spark.implicits._
    // Deterministic scatter incl. same-cell, cross-cell and boundary
    // (dist == r exactly) pairs.
    val pts = (1L to 300L).map(i => (i, (i * 7919) % 1000, (i * 104729) % 1000))
      .toDF("id", "x", "y")
    val r = 60L
    val grid = Layout.gridRadiusJoin(pts, "id", "x", "y", r)
      .collect().map(w => (w.getLong(0), w.getLong(1)) -> w.getLong(2)).toMap
    val naive = pts.as("a").crossJoin(pts.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))).as("d2"))
      .filter(col("d2") <= r * r)
      .collect().map(w => (w.getLong(0), w.getLong(1)) -> w.getLong(2)).toMap
    assert(grid == naive, s"grid=${grid.size} naive=${naive.size}")
    assert(naive.nonEmpty)
    // No duplicate emission: the map sizes above already prove keys
    // unique; also check the raw row count.
    assert(Layout.gridRadiusJoin(pts, "id", "x", "y", r).count() == naive.size)
  }
}
