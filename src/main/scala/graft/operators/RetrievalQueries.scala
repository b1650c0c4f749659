package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Oracle-checked queries for hybrid retrieval and vector-store
  * compression (VectorOps int8/MRL/k-means, TextDedup winnowing,
  * TrainingMix UniMax).
  *
  * Determinism notes: rankings compare either exact integers or
  * bit-identical doubles (double math over identical float inputs —
  * the q_ann_bruteforce-proven property), with id tiebreaks; the RRF
  * fusion score is a sum of two unit fractions of integer ranks, so
  * fusion order is engine-exact too.
  */
object RetrievalQueries {
  type Q = (SparkSession, String) => DataFrame

  private val rrfK = 60
  private val rrfTerms = Seq("spark", "window", "merge")
  private val unimaxBudget = 40000L
  private val unimaxCap = 2

  val queries: Map[String, Q] = Map(
    // #93d BM25 hard-negative mining (the dense-retriever training
    // recipe): per query term, the top lexically-confusable docs that
    // miss the tf>=2 pseudo-qrel relevance bar.
    "q_hard_negatives" -> { (s, dir) =>
      TextRank.bm25HardNegatives(Tables(s, dir).documents, "doc_id", "text",
        terms = Seq("spark", "window", "merge"), relTf = 2, k = 10)
        .select(col("term"), col("id").as("doc_id"), col("tf"), col("score"), col("rank"))
    },

    // #87b rank-biased overlap between the n_chars ranking and the
    // token-count ranking of documents (RBO@20, p = 0.9) — did the
    // new scorer reorder the head?
    "q_rbo" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Stats.rankBiasedOverlap(d, "doc_id", col("n_chars"),
        size(graft.functions.TextAnalysis.tokenize(col("text"))).cast("long"),
        col("doc_id"), depth = 20, p = 0.9)
    },

    // #93e sparse IDF-cosine similarity join over the pruned word-
    // trigram vocabulary (df <= 20) via the inverted index — top-50
    // doc pairs.
    "q_tfidf_pairs" -> { (s, dir) =>
      // df cap self-scales in-plan (Bayardo df²-mass budget 4600·N^¾)
      TextRank.tfidfCosinePairs(Tables(s, dir).documents, "doc_id", "text", topK = 50)
    },

    // #87 reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    // a BM25 lexical ranking and an embedding-cosine ranking — the
    // standard hybrid-search combiner. Both rank lists are top-100;
    // missing sides contribute zero.
    "q_rrf_fusion" -> { (s, dir) =>
      val t = Tables(s, dir)
      val lex = TextRank.bm25TopK(t.documents, "doc_id", "text", rrfTerms, k = 100)
        .select(col("id").as("doc_id"), col("rank").as("r_lex"))
      val e = t.embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sem = VectorOps.bruteForceTopK(e.filter(col("id") === 0), e, 100)
        .withColumn("r_sem",
          row_number().over(Window.orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
        .select(col("neighbor_id").as("doc_id"), col("r_sem"))
      val rrf =
        when(col("r_lex").isNotNull, lit(1.0) / (col("r_lex") + rrfK)).otherwise(lit(0.0)) +
          when(col("r_sem").isNotNull, lit(1.0) / (col("r_sem") + rrfK)).otherwise(lit(0.0))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("r_lex"), col("r_sem"), round(rrf, 6).as("rrf"))
        .withColumn("fused_rank",
          row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
        .filter(col("fused_rank") <= 20)
    },

    // #88 int8 scalar-quantization audit per vector.
    "q_quantize_int8" -> { (s, dir) =>
      VectorOps.quantizeInt8Stats(
        Tables(s, dir).embeddings.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding")
    },

    // #89 Matryoshka truncation recall: top-10 on the first 16 of 64
    // dims vs the full vector. Probe panel PINNED (same id<20000 cap
    // as the ANN queries): a fixed query set over a growing corpus
    // keeps the scan linear — an uncapped %20 panel would re-create
    // the quadratic probe growth round 6 removed.
    "q_mrl_recall" -> { (s, dir) =>
      VectorOps.truncatedRecall(
        Tables(s, dir).embeddings.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding",
        probeFilter = col("id") % 20 === 0 && col("id") < 20000, k = 10, dims = 16)
    },

    // #90 one Lloyd assignment step against deterministic centroids
    // (the IVF coarse quantizer's inner loop as a first-class op).
    "q_kmeans_assign" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cent = e.filter(col("id") < 8)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      VectorOps.kmeansAssign(e, "id", "vec", cent)
    },

    // #91 winnowing fingerprints (Schleimer et al. 2003): 3-gram
    // hashes, window 4, rightmost-min selection.
    "q_winnow" -> { (s, dir) =>
      TextDedup.winnowFingerprints(Tables(s, dir).documents, "doc_id", "text",
        ngram = 3, window = 4)
    },

    // #92 UniMax language-budget waterfilling (Chung et al. 2023).
    "q_unimax_mix" -> { (s, dir) =>
      TrainingMix.unimaxPlan(Tables(s, dir).documents, "lang",
        size(split(col("text"), " ")).cast("long"),
        budget = unimaxBudget, epochsCap = unimaxCap)
    },

    // #93b retrieval-quality eval: nDCG@10 / MRR / recall@10 of the
    // per-term BM25 ranking against tf>=2 pseudo-qrels.
    "q_retrieval_eval" -> { (s, dir) =>
      TextRank.retrievalEval(Tables(s, dir).documents, "doc_id", "text",
        terms = Seq("spark", "window", "merge", "data"), k = 10, relMin = 2L)
    },

    // Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001): the
    // language-modeling ranker beside BM25, mu = 2000, top-10 per term.
    "q_dirichlet_ql" -> { (s, dir) =>
      TextRank.dirichletQl(Tables(s, dir).documents, "doc_id", "text",
        terms = Seq("spark", "window", "merge", "data"), mu = 2000.0, k = 10)
        .withColumnRenamed("id", "doc_id")
    },

    // Expected Reciprocal Rank (Chapelle et al. 2009): the cascade-
    // model ranking metric beside nDCG — ERR@10 = Σᵣ (1/r)·Rᵣ·Π(1−Rᵢ)
    // with graded relevance R = (2^min(tf,4)−1)/16. The sequential
    // cascade product is exp of an ORDERED 10-row log window (both
    // engines fold the same terms in the same order), never a loop.
    "q_err" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val tfs = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term").isInCollection(Seq("spark", "window", "merge", "data")))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      val head = TopK.perKey(tfs, Seq("term"),
        struct((-col("tf")).as("nt"), col("doc_id").as("d")), 10)
      val w = Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id"))
      val wPrev = Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val rel = (pow(lit(2.0), least(col("tf"), lit(4L)).cast("double")) - lit(1.0)) /
        lit(16.0)
      head.withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("r", rel)
        .withColumn("pass_prob",
          coalesce(exp(sum(log(lit(1.0) - col("r"))).over(wPrev)), lit(1.0)))
        .groupBy("term")
        .agg(count(lit(1)).as("n_ranked"),
          round(sum(col("r") * col("pass_prob") / col("rank").cast("double")), 6)
            .as("err_at_10"))
    },

    // Ranking-fairness exposure (Singh & Joachims 2018): per query
    // term, each SOURCE's share of the position-discounted attention
    // 1/log2(rank+1) in the tf-ranked top-10 — does one source soak
    // up the ranking's exposure?
    "q_rank_exposure" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val tfs = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term").isInCollection(Seq("spark", "window", "merge", "data")))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      val head = TopK.perKey(tfs, Seq("term"),
        struct((-col("tf")).as("nt"), col("doc_id").as("d")), 10)
      val w = Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id"))
      val exposed = head.withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("exposure", lit(1.0) / log2(col("rank").cast("double") + 1.0))
      val tot = exposed.groupBy("term").agg(sum("exposure").as("tot_exp"))
      exposed.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("term", "source")
        .agg(count(lit(1)).as("n_docs"), sum("exposure").as("exp"))
        .join(broadcast(tot), "term")
        .select(col("term"), col("source"), col("n_docs"),
          round(col("exp") / col("tot_exp"), 6).as("exposure_share"))
    },

    // #93c MMR diversity re-ranking (Carbonell & Goldstein 1998):
    // greedy 5-of-20 selection, lambda = 0.7, over the vec_id-0 query.
    "q_mmr_select" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      VectorOps.mmrSelect(e, e.filter(col("id") === 0),
        shortlistK = 20, selectK = 5, lambda = 0.7)
    }
  )

  /** Programmatically unrolled MMR oracle: each greedy step is one
    * argmax CTE over the shortlist minus the already-selected set —
    * the same structure as the unrolled-PageRank oracle, in the raw
    * doubles the Spark side compares (rounding only at output).
    */
  private def mmrOracleSql(shortK: Int, selK: Int, lambda: Double): String = {
    val lam = lambda.toString
    val oml = (1 - lambda).toString
    val steps = new StringBuilder(
      s"sel1 AS (SELECT id, rel, $lam * rel AS mmr FROM sl ORDER BY mmr DESC, id LIMIT 1)")
    for (i <- 2 to selK) {
      val prev = (1 until i).map(j => s"SELECT id FROM sel$j").mkString(" UNION ALL ")
      steps.append(
        s""",
           |cand$i AS (SELECT c.id, c.rel, max(p.s) AS mx FROM sl c JOIN pr p ON p.ia = c.id
           |           WHERE p.ib IN ($prev) AND c.id NOT IN ($prev) GROUP BY c.id, c.rel),
           |sel$i AS (SELECT id, rel, $lam * rel - $oml * mx AS mmr FROM cand$i
           |          ORDER BY mmr DESC, id LIMIT 1)""".stripMargin)
    }
    val union = (1 to selK).map(i =>
      s"SELECT CAST($i AS BIGINT) AS sel_rank, id, round(rel, 6) + 0.0 AS relevance, " +
        s"round(mmr, 6) + 0.0 AS mmr_score FROM sel$i").mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE id = 0),
       |s0 AS (SELECT c.id, list_dot_product(q.qv, c.v) /
       |         (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))) AS rel
       |       FROM e c, q WHERE c.id <> 0),
       |sl AS (SELECT id, rel FROM (
       |         SELECT *, row_number() OVER (ORDER BY rel DESC, id) AS rn FROM s0) t
       |       WHERE rn <= $shortK),
       |sv AS (SELECT e.id, e.v FROM e JOIN sl USING (id)),
       |pr AS (SELECT a.id AS ia, b.id AS ib,
       |         list_dot_product(a.v, b.v) /
       |         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS s
       |       FROM sv a JOIN sv b ON a.id <> b.id),
       |$steps
       |$union""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_rbo" ->
      """WITH t AS (SELECT doc_id AS id, n_chars AS sa,
        |             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS sb
        |           FROM documents),
        |r AS (SELECT id,
        |        row_number() OVER (ORDER BY sa DESC, id) AS ra,
        |        row_number() OVER (ORDER BY sb DESC, id) AS rb FROM t),
        |k AS (SELECT id, greatest(ra, rb) AS m FROM r WHERE ra <= 20 AND rb <= 20),
        |d AS (SELECT unnest(range(1, 21)) AS d),
        |x AS (SELECT d.d, CAST(count(k.id) AS BIGINT) AS x
        |      FROM d LEFT JOIN k ON k.m <= d.d GROUP BY d.d)
        |SELECT CAST(20 AS BIGINT) AS depth, 0.9 + 0.0 AS p,
        |  round(list_reduce(list((1.0 - 0.9) * pow(0.9, d - 1) * x / d ORDER BY d),
        |                    (a, b) -> a + b), 4) + 0.0 AS rbo
        |FROM x""".stripMargin,
    "q_tfidf_pairs" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |t AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]))) AS tw
        |      FROM w WHERE len(ws) >= 3),
        |tf AS (SELECT doc_id, tw, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |d AS (SELECT tw, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tw),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |hc AS (SELECT df, sum(count(*)::HUGEINT * df * df) OVER (ORDER BY df) AS cum
        |       FROM d GROUP BY df),
        |cap AS (SELECT greatest(coalesce(max(df), 0), 2) AS cap FROM hc, nd
        |        WHERE cum <= 4600 * CAST(floor(sqrt(nd::DOUBLE) * sqrt(sqrt(nd::DOUBLE))) AS BIGINT)),
        |wt AS (SELECT tf.doc_id, tf.tw,
        |         tf.tf * (ln((nd.nd + 1.0) / (d.df + 1.0)) + 1.0) AS wt
        |       FROM tf JOIN d USING (tw), nd, cap WHERE d.df <= cap.cap),
        |nr AS (SELECT doc_id, list_reduce(list(wt * wt ORDER BY tw), (a, b) -> a + b) AS n2
        |       FROM wt GROUP BY doc_id),
        |p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |        list_reduce(list(x.wt * y.wt ORDER BY x.tw), (a, b) -> a + b) AS dot
        |      FROM wt x JOIN wt y ON y.tw = x.tw AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2),
        |c AS (SELECT id_a, id_b,
        |        round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
        |      FROM p JOIN nr na ON na.doc_id = id_a JOIN nr nb ON nb.doc_id = id_b)
        |SELECT id_a, id_b, cosine + 0.0 AS cosine, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT id_a, id_b, cosine,
        |         row_number() OVER (ORDER BY cosine DESC, id_a, id_b) AS rn
        |  FROM c) q
        |WHERE rn <= 50""".stripMargin,
    "q_hard_negatives" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |st AS (SELECT count(*) AS n, avg(len(ws)) AS avglen FROM w),
        |t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
        |      WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2, 3),
        |d AS (SELECT term, count(*) AS df FROM f GROUP BY term),
        |s AS (SELECT f.term, f.doc_id, f.tf,
        |        round(ln((st.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * (f.tf * 2.2) /
        |              (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / st.avglen)), 4) AS score
        |      FROM f JOIN d USING (term), st
        |      WHERE f.tf < 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rn
        |      FROM s)
        |SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, score + 0.0 AS score,
        |       CAST(rn AS BIGINT) AS rank
        |FROM r WHERE rn <= 10""".stripMargin,
    "q_rrf_fusion" ->
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
         |st AS (SELECT count(*) AS n, avg(len(ws)) AS avglen FROM w),
         |t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
         |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
         |      WHERE term IN (${rrfTerms.map("'" + _ + "'").mkString(", ")}) GROUP BY 1, 2, 3),
         |d AS (SELECT term, count(*) AS df FROM f GROUP BY term),
         |sc AS (SELECT f.doc_id,
         |        sum(ln((st.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |            * (f.tf * 2.2) / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / st.avglen))) AS score
         |      FROM f JOIN d USING (term), st GROUP BY f.doc_id),
         |lex AS (SELECT doc_id, CAST(rn AS BIGINT) AS r_lex FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rn
         |  FROM sc) q WHERE rn <= 100),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |sem AS (SELECT neighbor_id AS doc_id, CAST(rn AS BIGINT) AS r_sem FROM (
         |  SELECT c.vec_id AS neighbor_id,
         |         row_number() OVER (ORDER BY
         |           list_dot_product(p.v, c.v) /
         |             (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
         |           c.vec_id) AS rn
         |  FROM e p JOIN e c ON p.vec_id = 0 AND c.vec_id <> 0) q WHERE rn <= 100),
         |fused AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, r_lex, r_sem,
         |  round(CASE WHEN r_lex IS NOT NULL THEN 1.0 / (r_lex + $rrfK) ELSE 0.0 END +
         |        CASE WHEN r_sem IS NOT NULL THEN 1.0 / (r_sem + $rrfK) ELSE 0.0 END, 6) AS rrf
         |  FROM lex FULL OUTER JOIN sem USING (doc_id))
         |SELECT doc_id, r_lex, r_sem, rrf, CAST(fr AS BIGINT) AS fused_rank FROM (
         |  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS fr FROM fused) q
         |WHERE fr <= 20""".stripMargin,
    "q_quantize_int8" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |a AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        |q AS (SELECT vec_id, amax, v,
        |        list_transform(v, x -> CASE WHEN amax = 0 THEN CAST(0 AS BIGINT)
        |          ELSE CAST(least(greatest(round(x * 127.0 / amax), -127.0), 127.0) AS BIGINT)
        |          END) AS qs
        |      FROM a)
        |SELECT vec_id, round(amax, 6) AS amax,
        |  CAST(list_sum(qs) AS BIGINT) AS sum_q,
        |  CAST(len(list_filter(qs, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
        |  round(list_max(list_transform(range(1, len(v) + 1), i ->
        |    CASE WHEN amax = 0 THEN 0.0
        |         ELSE abs(v[i] - qs[i]::DOUBLE * amax / 127.0) END)), 6) AS max_abs_err
        |FROM q""".stripMargin,
    "q_mrl_recall" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |t AS (SELECT id, v[1:16] AS v FROM e),
        |ft AS (SELECT probe_id, neighbor_id FROM (
        |  SELECT p.id AS probe_id, c.id AS neighbor_id,
        |    row_number() OVER (PARTITION BY p.id ORDER BY
        |      list_dot_product(p.v, c.v) /
        |        (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
        |      c.id) AS rn
        |  FROM e p JOIN e c ON p.id % 20 = 0 AND p.id < 20000 AND c.id <> p.id) x WHERE rn <= 10),
        |tt AS (SELECT probe_id, neighbor_id FROM (
        |  SELECT p.id AS probe_id, c.id AS neighbor_id,
        |    row_number() OVER (PARTITION BY p.id ORDER BY
        |      list_dot_product(p.v, c.v) /
        |        (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
        |      c.id) AS rn
        |  FROM t p JOIN t c ON p.id % 20 = 0 AND p.id < 20000 AND c.id <> p.id) x WHERE rn <= 10),
        |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
        |      FROM ft JOIN tt USING (probe_id, neighbor_id)),
        |np AS (SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes FROM ft)
        |SELECT np.n_probes, 10 AS k, 16 AS dims_kept, h.n_hits,
        |  round(h.n_hits::DOUBLE / (np.n_probes * 10)::DOUBLE, 4) AS recall
        |FROM h, np""".stripMargin,
    "q_kmeans_assign" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
        |d AS (SELECT e.id, c.cid,
        |        list_dot_product(e.v, e.v) + list_dot_product(c.cv, c.cv) -
        |          2.0 * list_dot_product(e.v, c.cv) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT id, cid FROM (
        |        SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
        |        FROM d) x WHERE rn = 1)
        |SELECT cid, CAST(count(*) AS BIGINT) AS n_members, CAST(sum(id) AS BIGINT) AS sum_ids,
        |       min(id) AS min_id, max(id) AS max_id
        |FROM a GROUP BY cid""".stripMargin,
    "q_winnow" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |wh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i ->
        |          {'pos': i - 1,
        |           'h': CASE WHEN length(ws[i]) = 0 THEN CAST(0 AS BIGINT)
        |             ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                    list_transform(range(1, length(ws[i]) + 1),
        |                      j -> CAST(ascii(ws[i][j]) AS BIGINT))),
        |                  (a, b) -> (a * 131 + b) % 1000000007) END})) AS u
        |        FROM w),
        |wh AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM wh0),
        |g AS (SELECT doc_id, pos,
        |        ((h * 31 + lead(h, 1) OVER win) % 1000000007 * 31 + lead(h, 2) OVER win)
        |          % 1000000007 AS gh
        |      FROM wh WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        |gg AS (SELECT doc_id, pos, gh,
        |         lead(gh, 1) OVER win AS g1, lead(gh, 2) OVER win AS g2, lead(gh, 3) OVER win AS g3
        |       FROM g WHERE gh IS NOT NULL WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        |sel AS (SELECT DISTINCT doc_id,
        |          pos + (CASE WHEN g3 = mn THEN 3 WHEN g2 = mn THEN 2
        |                      WHEN g1 = mn THEN 1 ELSE 0 END) AS sel_pos,
        |          mn AS fp
        |        FROM (SELECT *, least(gh, g1, g2, g3) AS mn FROM gg WHERE g3 IS NOT NULL) x)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps, min(fp) AS min_fp, max(fp) AS max_fp
        |FROM sel GROUP BY doc_id""".stripMargin,
    "q_unimax_mix" ->
      s"""WITH c0 AS (SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |            FROM documents GROUP BY lang),
         |c AS (SELECT lang, n_tokens, n_tokens * $unimaxCap AS capacity FROM c0),
         |s AS (SELECT *, row_number() OVER (ORDER BY capacity, lang) AS i,
         |        sum(capacity) OVER (ORDER BY capacity, lang) AS cum,
         |        count(*) OVER () AS n
         |      FROM c),
         |p AS (SELECT *, max(CASE WHEN capacity * (n - i) <= $unimaxBudget - cum THEN i END)
         |        OVER () AS m FROM s),
         |p2 AS (SELECT *, max(CASE WHEN i = m THEN cum END) OVER () AS cumM FROM p),
         |al AS (SELECT lang, n_tokens, CAST(capacity AS BIGINT) AS capacity,
         |         round(CASE WHEN COALESCE(m, 0) = n THEN capacity::DOUBLE
         |           ELSE least(capacity::DOUBLE,
         |             ($unimaxBudget - COALESCE(cumM, 0))::DOUBLE /
         |               (n - COALESCE(m, 0))::DOUBLE) END, 2) AS alloc_tokens
         |       FROM p2)
         |SELECT lang, n_tokens, capacity, alloc_tokens,
         |       round(alloc_tokens / n_tokens, 4) AS epochs
         |FROM al""".stripMargin,
    // Same single-term BM25 chain as q_bm25 (per-term partition),
    // binary tf>=2 qrels, closed-form DCG/IDCG via list arithmetic.
    "q_err" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |f AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t
        |      WHERE term IN ('spark', 'window', 'merge', 'data') GROUP BY 1, 2),
        |r AS (SELECT term, doc_id, tf,
        |        CAST(row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS BIGINT)
        |          AS rank,
        |        (pow(2.0, CAST(least(tf, 4) AS DOUBLE)) - 1.0) / 16.0 AS rel
        |      FROM f QUALIFY rank <= 10),
        |p AS (SELECT term, rank, rel,
        |        coalesce(exp(sum(ln(1.0 - rel)) OVER (PARTITION BY term ORDER BY rank
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 1.0) AS pass_prob
        |      FROM r)
        |SELECT term, CAST(count(*) AS BIGINT) AS n_ranked,
        |  round(sum(rel * pass_prob / CAST(rank AS DOUBLE)), 6) AS err_at_10
        |FROM p GROUP BY term""".stripMargin,

    "q_rank_exposure" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |f AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t
        |      WHERE term IN ('spark', 'window', 'merge', 'data') GROUP BY 1, 2),
        |r AS (SELECT term, doc_id, tf,
        |        CAST(row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS BIGINT)
        |          AS rank
        |      FROM f QUALIFY rank <= 10),
        |x AS (SELECT term, doc_id, 1.0 / log2(CAST(rank AS DOUBLE) + 1.0) AS exposure FROM r),
        |tt AS (SELECT term, sum(exposure) AS tot_exp FROM x GROUP BY term),
        |g AS (SELECT x.term, d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |        sum(x.exposure) AS exp
        |      FROM x JOIN documents d USING (doc_id) GROUP BY 1, 2)
        |SELECT g.term, g.source, g.n_docs,
        |  round(g.exp / tt.tot_exp, 6) AS exposure_share
        |FROM g JOIN tt ON tt.term = g.term""".stripMargin,

    "q_dirichlet_ql" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS term FROM w),
        |f AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, CAST(max(dl) AS BIGINT) AS dl
        |      FROM base WHERE term IN ('spark', 'window', 'merge', 'data') GROUP BY 1, 2),
        |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM f GROUP BY term),
        |cl AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS clen FROM w),
        |sc AS (SELECT term, doc_id, tf,
        |         round(ln((CAST(tf AS DOUBLE) + 2000.0 * CAST(cf AS DOUBLE) / CAST(clen AS DOUBLE))
        |                  / (CAST(dl AS DOUBLE) + 2000.0)), 4) AS score
        |       FROM f JOIN cf USING (term) CROSS JOIN cl),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id)
        |        AS BIGINT) AS doc_rank FROM sc)
        |SELECT term, doc_id, tf, score, doc_rank FROM r WHERE doc_rank <= 10""".stripMargin,

    "q_retrieval_eval" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |st AS (SELECT count(*) AS n, avg(len(ws)) AS avglen FROM w),
        |t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |f AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM t
        |      WHERE term IN ('spark', 'window', 'merge', 'data') GROUP BY 1, 2, 3),
        |d AS (SELECT term, count(*) AS df FROM f GROUP BY term),
        |sc AS (SELECT f.term, f.doc_id, f.tf,
        |         round(ln((st.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |           * (f.tf * 2.2) / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / st.avglen)), 4) AS score
        |       FROM f JOIN d USING (term), st),
        |rk AS (SELECT term, doc_id, tf, score,
        |         CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |       FROM sc),
        |topk AS (SELECT *, tf >= 2 AS rel FROM rk WHERE rank <= 10),
        |nr AS (SELECT term, CAST(count(*) AS BIGINT) AS n_rel FROM f WHERE tf >= 2 GROUP BY term),
        |ag AS (SELECT term,
        |         CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_ret_rel,
        |         min(CASE WHEN rel THEN rank END) AS first_rel,
        |         sum(CASE WHEN rel THEN 1.0 / log2(rank::DOUBLE + 1.0) ELSE 0.0 END) AS dcg
        |       FROM topk GROUP BY term)
        |SELECT ag.term, coalesce(nr.n_rel, 0) AS n_rel, ag.n_ret_rel,
        |  round(coalesce(1.0 / first_rel::DOUBLE, 0.0), 6) + 0.0 AS mrr,
        |  round(ag.n_ret_rel::DOUBLE / nr.n_rel::DOUBLE, 6) + 0.0 AS recall_at_k,
        |  round(ag.dcg / list_sum(list_transform(range(1, least(10, nr.n_rel) + 1),
        |    i -> 1.0 / log2(i::DOUBLE + 1.0))), 6) + 0.0 AS ndcg_at_k
        |FROM ag LEFT JOIN nr USING (term)""".stripMargin,
    "q_mmr_select" -> mmrOracleSql(shortK = 20, selK = 5, lambda = 0.7)
  )
}
