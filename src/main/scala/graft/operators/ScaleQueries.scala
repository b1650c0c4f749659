package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{Hilbert2, ZOrder2}
import graft.sources.Tables

/** Oracle-checked queries for the physical-layout and semantic-
  * decontamination operators (Layout.scala, VectorOps
  * .decontaminateByEmbedding). Everything here is integer/rounded
  * arithmetic a DuckDB twin reproduces bit-for-bit.
  */
object ScaleQueries {
  type Q = (SparkSession, String) => DataFrame

  private val zBits = 8
  // Sits inside the max-benchmark-cosine distribution at every sf
  // (measured quartiles ~0.21..0.34), so the gate fires both ways and
  // the oracle checks a real decision, not a constant column.
  private val decontamTau = 0.3

  val queries: Map[String, Q] = Map(
    // Z-order clustering proof: bucket lineitem by the top 4 bits of
    // z(l_partkey, l_suppkey) and report each bucket's bounding box in
    // BOTH source dimensions — the min-max spans parquet footers would
    // carry if the table were written in this order, i.e. the data-
    // skipping contract itself (a selective filter on either key
    // prunes every bucket whose box misses it). The interleave is the
    // native ZOrder2 expression; keys normalize to [0,256) by their
    // max so the math is integer-exact and engine-portable.
    "q_zorder_layout" -> { (s, dir) =>
      Layout.withZ(
        Tables(s, dir).lineitem.select(col("l_partkey"), col("l_suppkey")),
        "l_partkey", "l_suppkey", zBits)
        .groupBy((col("z") / lit(1L << (2 * zBits - 4))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
    },

    // Hilbert-curve layout twin of q_zorder_layout: same 16-bucket
    // contract on the same keys, but positions come from the Hilbert
    // walk (native Hilbert2 expression) — consecutive positions are
    // ADJACENT cells, so the per-bucket bounding boxes this reports
    // are tighter than Morton's and min-max pruning discards more
    // files for the same filter. Oracle replays the identical xy2d
    // level walk as a CTE chain.
    "q_hilbert_layout" -> { (s, dir) =>
      Layout.withH(
        Tables(s, dir).lineitem.select(col("l_partkey"), col("l_suppkey")),
        "l_partkey", "l_suppkey", zBits)
        .groupBy((col("h") / lit(1L << (2 * zBits - 4))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
    },

    // Embedding-space benchmark decontamination: every 20th embedding
    // (id-capped, like the ANN probe sets) plays the held-out eval
    // suite; each remaining corpus vector reports its max benchmark
    // cosine and whether it survives the gate. Corpus × benchmark
    // scoring partial-aggregates map-side — only one row per corpus
    // doc ever shuffles.
    "q_embed_decontam" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val bench = e.filter(col("id") % 20 === 0 && col("id") < 20000)
      VectorOps.decontaminateByEmbedding(
        e.filter(col("id") % 20 =!= 0), bench, decontamTau)
    },

    // #42bn2 embedding-space drift per label: even-id snapshot vs
    // odd-id snapshot centroids compared by cosine + L2 — semantic
    // drift detection next to the scalar PSI/KS/EMD gates.
    "q_embed_drift" -> { (s, dir) =>
      VectorOps.centroidDrift(Tables(s, dir).embeddings, "label", "embedding",
        col("vec_id") % 2 === 0)
    },

    // Linear CKA between the two 32-dim halves of the embedding —
    // representation similarity: do the halves encode the same
    // structure (Kornblith et al. 2019)?
    "q_cka" -> { (s, dir) =>
      VectorOps.linearCka(Tables(s, dir).embeddings, "embedding", splitAt = 32)
    },

    // 2-D point-in-box spatial join via z-cell cover: eight
    // deterministic overlapping boxes over the (l_partkey, l_suppkey)
    // plane, matched by a broadcast HASH join on the grid cell + exact
    // bounds verify — the spatial-join shape Spark lacks natively.
    // Per-box rollup keeps the output stable under lineitem's
    // by-design duplicate rows.
    "q_spatial_join" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem.select(col("l_partkey"), col("l_suppkey"))
      val m = li.agg(max(col("l_partkey")).as("xm"), max(col("l_suppkey")).as("ym"))
      val boxes = s.range(0, 8).crossJoin(broadcast(m)).select(
        col("id").as("box_id"),
        ((col("id") * (col("xm") + 1L)) / 8L).cast("long").as("x0"),
        (((col("id") + 2L) * (col("xm") + 1L)) / 8L).cast("long").minus(1L).as("x1"),
        (((col("id") % 4L) * (col("ym") + 1L)) / 4L).cast("long").as("y0"),
        ((((col("id") % 4L) + 2L) * (col("ym") + 1L)) / 4L).cast("long").minus(1L).as("y1"))
      Layout.zCellRangeJoin(li, "l_partkey", "l_suppkey", boxes, level = 5)
        .groupBy("box_id")
        .agg(count(lit(1)).as("n_points"),
          sum(col("l_partkey")).as("sum_pk"), sum(col("l_suppkey")).as("sum_sk"))
    },

    // Training-output shard fan-out: 32 md5-assigned shards with
    // per-shard doc/token/source totals and the token share vs a
    // perfectly even split — the report that signs off "write the
    // mix" (imbalance here means stragglers at training time).
    "q_shard_balance" -> { (s, dir) =>
      Layout.shardBalance(Tables(s, dir).documents, "doc_id",
        size(split(col("text"), " ")).cast("long"), "source", nShards = 32)
    },

    // Fixed-radius ε-neighborhood self-join via the 3×3 grid stencil —
    // customers placed deterministically on an integer plane sized by
    // the ROW COUNT, with positions from the engine-portable md5-hex
    // hash (not a `key·multiplier mod W` lattice: round 12 found the
    // lattice leaves ZERO qualifying pairs at sf1 — the scale-up
    // tool's sparse custkey differences never satisfy both coordinate
    // congruences at W = 1.5e8 — which made any sf1 check vacuous).
    // A 15-hex-digit prefix (60 bits, the width the md5-prefix
    // samplers elsewhere use): an 8-digit prefix is < 2^32, so the
    // `% (k·1000)` would stop being uniform — and the scale-invariant
    // pair density with it — once k·1000 approached 4.3e9 (~sf28);
    // 60 bits holds uniformity to k ~ 10^15. Hash positions are
    // uniform at every scale, so the ~600-pair density and the
    // per-cell stencil workload are truly scale-invariant. The oracle
    // is the brute-force O(n²) join: same pairs, the grid only prunes
    // (candidate dx/dy there are stencil-bounded by 2·radius, so its
    // Long dist2 cannot overflow at any corpus size; the oracle's
    // all-pairs dx/dy are plane-sized, hence its HUGEINT).
    "q_geo_radius" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val k = c.agg(count(lit(1)).as("k"))
      def pos(salt: String) =
        conv(substring(md5(concat(col("c_custkey").cast("string"), lit(salt))), 1, 15), 16, 10)
          .cast("long") % (col("k") * 1000L)
      val pts = c.crossJoin(broadcast(k)).select(
        col("c_custkey").as("id"), pos(":x").as("x"), pos(":y").as("y"))
      Layout.gridRadiusJoin(pts, "id", "x", "y", radius = 20000L)
    }
  )

  val oracles: Map[String, String] = Map(
    "q_zorder_layout" ->
      s"""WITH m AS (SELECT max(l_partkey) AS xm, max(l_suppkey) AS ym FROM lineitem),
         |z AS (SELECT ${ZOrder2.sqlDuck(
               s"((l_partkey * ${1L << zBits}) // (xm + 1))",
               s"((l_suppkey * ${1L << zBits}) // (ym + 1))", zBits)} AS zv,
         |             l_partkey, l_suppkey
         |      FROM lineitem CROSS JOIN m)
         |SELECT zv // ${1L << (2 * zBits - 4)} AS bucket, count(*) AS cnt,
         |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
         |FROM z GROUP BY 1""".stripMargin,

    "q_hilbert_layout" -> {
      val (ctes, last) = Hilbert2.sqlDuckCtes("b", zBits, Seq("l_partkey", "l_suppkey"))
      s"""WITH m AS (SELECT max(l_partkey) AS xm, max(l_suppkey) AS ym FROM lineitem),
         |b AS (SELECT l_partkey, l_suppkey,
         |        (l_partkey * ${1L << zBits}) // (xm + 1) AS hx0,
         |        (l_suppkey * ${1L << zBits}) // (ym + 1) AS hy0
         |      FROM lineitem CROSS JOIN m),
         |$ctes
         |SELECT hd // ${1L << (2 * zBits - 4)} AS bucket, count(*) AS cnt,
         |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
         |FROM $last GROUP BY 1""".stripMargin
    },

    "q_embed_drift" ->
      """WITH e AS (SELECT label AS g, vec_id % 2 = 0 AS a, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |x AS (SELECT g, a, i.i AS pos, avg(v[i.i]) AS m
        |      FROM e, unnest(range(1, len(v) + 1)) AS i(i) GROUP BY 1, 2, 3),
        |ca AS (SELECT g, list(m ORDER BY pos) AS u FROM x WHERE a GROUP BY g),
        |cb AS (SELECT g, list(m ORDER BY pos) AS w FROM x WHERE NOT a GROUP BY g),
        |n AS (SELECT g, CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |      FROM e GROUP BY g),
        |j AS (SELECT ca.g, u, w FROM ca JOIN cb USING (g))
        |SELECT j.g AS label, n.n_a, n.n_b,
        |  round(list_dot_product(u, w) /
        |    (sqrt(list_dot_product(u, u)) * sqrt(list_dot_product(w, w))), 4) + 0.0
        |    AS centroid_cosine,
        |  round(sqrt(list_sum(list_transform(range(1, len(u) + 1),
        |    i -> (u[i] - w[i]) * (u[i] - w[i])))), 4) + 0.0 AS centroid_l2
        |FROM j JOIN n ON n.g = j.g""".stripMargin,
    "q_embed_decontam" ->
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT id, v FROM e WHERE id % 20 = 0 AND id < 20000),
         |c AS (SELECT id, v FROM e WHERE id % 20 <> 0),
         |s AS (SELECT c.id,
         |        round(list_dot_product(c.v, b.v) /
         |          (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
         |      FROM c CROSS JOIN b)
         |SELECT id, max(sim) + 0.0 AS max_bench_sim,
         |       CAST(sum(CASE WHEN sim >= $decontamTau THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_bench_hits,
         |       max(sim) < $decontamTau AS keep
         |FROM s GROUP BY id""".stripMargin,

    // The oracle needs no cells: the cover join is exact by
    // construction (over-approximate candidates + exact verify), so
    // the naive BETWEEN join IS the semantics.
    "q_spatial_join" ->
      """WITH m AS (SELECT max(l_partkey) AS xm, max(l_suppkey) AS ym FROM lineitem),
        |ks AS (SELECT range AS k FROM range(0, 8)),
        |b AS (SELECT k AS box_id,
        |        (k * (xm + 1)) // 8 AS x0, ((k + 2) * (xm + 1)) // 8 - 1 AS x1,
        |        ((k % 4) * (ym + 1)) // 4 AS y0, (((k % 4) + 2) * (ym + 1)) // 4 - 1 AS y1
        |      FROM ks CROSS JOIN m)
        |SELECT b.box_id, CAST(count(*) AS BIGINT) AS n_points,
        |       CAST(sum(l.l_partkey) AS BIGINT) AS sum_pk,
        |       CAST(sum(l.l_suppkey) AS BIGINT) AS sum_sk
        |FROM lineitem l JOIN b ON l.l_partkey BETWEEN b.x0 AND b.x1
        |                      AND l.l_suppkey BETWEEN b.y0 AND b.y1
        |GROUP BY b.box_id""".stripMargin,

    "q_shard_balance" ->
      s"""WITH d AS (SELECT ${Layout.shardSqlDuck("doc_id::VARCHAR", 32)} AS shard,
         |             len(string_split(text, ' ')) AS tok, source
         |           FROM documents),
         |p AS (SELECT shard, count(*) AS docs, CAST(sum(tok) AS BIGINT) AS tokens,
         |             count(DISTINCT source) AS sources
         |      FROM d GROUP BY shard),
         |t AS (SELECT sum(tokens) AS tt FROM p)
         |SELECT shard, docs, tokens, sources,
         |       round(tokens::DOUBLE * 32 / tt::DOUBLE, 4) + 0.0 AS even_share
         |FROM p CROSS JOIN t""".stripMargin,

    // Feature-space CKA re-derived as pure SQL: the d² gram cells from
    // positional list indexing, centered, Frobenius-folded per block.
    "q_cka" ->
      """WITH e AS (SELECT embedding AS v FROM embeddings WHERE embedding IS NOT NULL),
        |g AS (SELECT ij.i, ij.j,
        |        sum(CAST(v[ij.i + 1] AS DOUBLE) * CAST(v[ij.j + 1] AS DOUBLE)) AS s
        |      FROM e CROSS JOIN (SELECT a.range AS i, b.range AS j
        |                         FROM range(0, 64) a, range(0, 64) b) ij
        |      GROUP BY 1, 2),
        |m AS (SELECT i.range AS i, sum(CAST(v[i.range + 1] AS DOUBLE)) AS m,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM e CROSS JOIN range(0, 64) i GROUP BY 1),
        |c AS (SELECT g.i, g.j, g.s - mi.m * mj.m / CAST(mi.n AS DOUBLE) AS c, mi.n
        |      FROM g JOIN m mi ON mi.i = g.i JOIN m mj ON mj.i = g.j),
        |b AS (SELECT CASE WHEN i < 32 AND j < 32 THEN 'xx'
        |               WHEN i >= 32 AND j >= 32 THEN 'yy'
        |               WHEN i < 32 AND j >= 32 THEN 'xy' ELSE 'yx' END AS b,
        |        c * c AS c2, n FROM c),
        |f AS (SELECT b, sum(c2) AS f2, max(n) AS n FROM b WHERE b <> 'yx' GROUP BY b)
        |SELECT max(n) AS n, CAST(32 AS INT) AS d_split,
        |  round(sum(CASE WHEN b = 'xy' THEN f2 END) /
        |        (sqrt(sum(CASE WHEN b = 'xx' THEN f2 END)) *
        |         sqrt(sum(CASE WHEN b = 'yy' THEN f2 END))), 4) AS cka
        |FROM f""".stripMargin,

    // Brute-force O(n²) reference for the grid-stencil radius join:
    // membership is decided by EXACT integer arithmetic on both
    // sides, so the sets must match pair-for-pair.
    "q_geo_radius" ->
      """WITH k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM customer),
        |p AS (SELECT CAST(c_custkey AS BIGINT) AS id,
        |        ('0x' || substr(md5(c_custkey::VARCHAR || ':x'), 1, 15))::BIGINT % (k.k * 1000) AS x,
        |        ('0x' || substr(md5(c_custkey::VARCHAR || ':y'), 1, 15))::BIGINT % (k.k * 1000) AS y
        |      FROM customer CROSS JOIN k)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(CAST(a.x - b.x AS HUGEINT)*(a.x - b.x)
        |       + CAST(a.y - b.y AS HUGEINT)*(a.y - b.y) AS BIGINT) AS dist2
        |FROM p a JOIN p b ON b.id > a.id
        |WHERE CAST(a.x - b.x AS HUGEINT)*(a.x - b.x)
        |      + CAST(a.y - b.y AS HUGEINT)*(a.y - b.y) <= 400000000""".stripMargin
  )
}
