package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BM25 text retrieval (Robertson & Zaragoza 2009) — the lexical
  * search primitive an LLM data pipeline uses for targeted corpus
  * mining (find documents about X) and retrieval-based decontamination.
  *
  * Scale shape: the corpus explodes to (term, doc_id, tf) triples
  * FILTERED to the query's terms before any shuffle — document text
  * never moves, and the only shuffled rows are per-(query-term, doc)
  * counts. Document frequencies aggregate from those same triples
  * (query terms only, not a full corpus vocabulary), and corpus-level
  * stats (N, avg length) ride along as a broadcast single-row frame —
  * no driver-side collect anywhere. 100 TB of text scores a query
  * with one scan plus two narrow shuffles.
  */
object TextRank {

  /** Top-k documents for a bag-of-words query, scored with BM25.
    * Scores are rounded to 4 decimals BEFORE ranking (with doc id as
    * tiebreak): per-term scores are bit-exact across engines (integer
    * tf/df/N and an exact rational avglen feed ln and division
    * identically), but the per-document SUM of term scores is float
    * addition whose order an engine may choose freely — ranking on the
    * rounded value keeps the result reproducible.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKReleasable(docs, idCol, textCol, query, k, k1, b)._1

  /** bm25TopK with a [[CacheHandle]] for the persisted tokenized
    * projection (see CacheHandle's doc for the contract).
    *
    * `storage` sets the cache's level: the default MEMORY_AND_DISK is
    * right up to mid scale, but this cache is CORPUS-TOKEN-sized — at
    * 100 TB pass StorageLevel.DISK_ONLY so it doesn't compete with
    * shuffle/exec memory (double tokenization still costs more than a
    * disk round-trip).
    */
  def bm25TopKReleasable(docs: DataFrame, idCol: String, textCol: String,
                         query: Seq[String], k: Int,
                         k1: Double = 1.2, b: Double = 0.75,
                         storage: org.apache.spark.storage.StorageLevel =
                           org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, CacheHandle) = {
    val handle = CacheHandle()
    // Persisted: the corpus stats (N, avg length) and the term explode
    // both need the tokenization; computing them as separate subplans
    // would scan and re-tokenize the corpus twice. The cache is one
    // token array per document — raw-text-sized, not explode-sized —
    // and the stats pass over it reads only array lengths.
    val perDoc = handle.track(docs
      .select(col(idCol).as("id"), split(lower(col(textCol)), " ").as("toks"))
      .persist(storage))
    val base = perDoc.select(col("id"), size(col("toks")).cast("long").as("dl"),
      explode(col("toks")).as("term"))
    val hits = base.filter(col("term").isInCollection(query))
    val tfs = hits.groupBy("id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = perDoc.agg(
      count(lit(1)).as("n"),
      avg(size(col("toks"))).as("avglen"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val termScore = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avglen")))
    val scored = tfs
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), termScore.as("s"))
      .groupBy("id")
      .agg(sum(col("s")).as("score"))
      .select(col("id"), round(col("score"), 4).as("score"))
    import org.apache.spark.sql.expressions.Window
    // orderBy+limit plans TakeOrderedAndProject (per-partition top-k,
    // driver merge of k rows) — not a single-partition global sort;
    // the rank window then runs over only k rows.
    val ranked = scored.orderBy(col("score").desc, col("id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
    (ranked, handle)
  }

  /** All-pairs document similarity by IDF-weighted cosine over the
    * PRUNED word-TRIGRAM vocabulary (df ≤ `maxDf`) via the inverted
    * index — the classic sparse similarity join (Bayardo et al. 2007's
    * candidate shape): only documents sharing a surviving trigram ever
    * pair, so candidate volume is Σ_{df≤maxDf} df² ≤ maxDf·Σdf —
    * LINEAR in corpus size with the cap fixed, never |D|². Trigram
    * (not unigram) features are the load-bearing choice: corpus
    * vocabularies are heavy-tailed at the word level (a word shared by
    * 1% of a 10⁹-doc corpus still blows the join) while n-gram df
    * decays geometrically, and dropping high-df features is standard
    * practice anyway (stopword-frequency features carry no
    * discriminative mass). Features are per-doc DISTINCT shingles, so
    * tf is binary and the weight is pure smoothed idf.
    *
    * Determinism: per-pair dot products and per-doc norms fold in
    * TERM-ASCENDING order (single-token pairs ARE their one product —
    * order-free; the multi-token tail refolds through sort_array +
    * aggregate), so the double sequence is identical on any engine /
    * partition order; ranking is (6-dp cosine, id, id). idf =
    * ln((N+1)/(df+1)) + 1 — the smoothed sklearn form.
    *
    * The df cap SELF-SCALES (`maxDf = 0`, the default): the Bayardo
    * candidate bound Σ_{df≤cap} df² is held under a budget of
    * `capBudgetC · N^¾` by picking the largest cap whose cumulative
    * df²-mass fits — derived IN-PLAN from the df histogram (cumulative
    * window at histogram grain, bounded by distinct df values), so the
    * knob turns itself as the corpus grows instead of waiting for an
    * operator to re-tune it. N^¾ = sqrt(N)·sqrt(sqrt(N)) — two
    * correctly-rounded IEEE sqrts, engine-exact in the DuckDB oracle.
    * Sub-linear by design: per-doc candidate work SHRINKS slowly at
    * scale (measured trigram mass is ~552·N at cap 20 regardless of
    * sf, so a fixed cap holds the ladder ratio only barely; the ¾
    * power buys the headroom). Floor of 2 so pair formation never
    * dies. A positive `maxDf` pins the legacy fixed cap (tests).
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       maxDf: Long = 0, topK: Int = 50,
                       capBudgetC: Long = 4600): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(TextAnalysis.wordNgrams(col(textCol), 3)).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val dfAll = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val dfc =
      if (maxDf > 0) dfAll.filter(col("df") <= maxDf)
      else {
        import org.apache.spark.sql.expressions.Window
        val wcum = Window.orderBy("df")
        val capRow = dfAll.groupBy("df").agg(count(lit(1)).as("nt"))
          .select(col("df"),
            sum(col("nt").cast("decimal(19,0)") * col("df").cast("decimal(19,0)") *
              col("df").cast("decimal(19,0)")).over(wcum).as("cum"))
          .crossJoin(broadcast(nDocs))
          .filter(col("cum") <= (lit(capBudgetC) *
            floor(sqrt(col("nd").cast("double")) * sqrt(sqrt(col("nd").cast("double"))))
              .cast("long")).cast("decimal(38,0)"))
          .agg(greatest(coalesce(max("df"), lit(0L)), lit(2L)).as("cap"))
        dfAll.crossJoin(broadcast(capRow)).filter(col("df") <= col("cap")).drop("cap")
      }
    val wt = tf.join(broadcast(dfc), "w").crossJoin(broadcast(nDocs))
      .select(col("id"), col("w"),
        (col("tf") * (log((col("nd") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))).as("wt"))
      .localCheckpoint(true)
    // SINGLE/MULTI verification split: in a df-capped trigram space the
    // measured pair population is ~94% pairs sharing exactly ONE token
    // (sf1: 5.41M of 5.76M), and a one-product dot needs NO fold
    // ordering — it is order-exact by construction. So the pair
    // aggregation is NARROW (count + min(struct(w,p)) + norms, all
    // map-side combinable, no per-pair array build), and only the ~6%
    // multi-token tail pays the ordered refold (ascending-w
    // sort_array+aggregate — the identical IEEE sequence the old
    // all-pairs collect_list produced, so hashes are unchanged; for
    // k=1 the old fold was 0.0+p = p, also bit-identical). Norms ride
    // the posting rows (doc-grain join BEFORE the self-join), so no
    // pair-grain norm joins exist at all.
    //
    // UNHINTED joins (round 14): the pair self-join's former
    // shuffle_hash pin paid a per-task hash-relation build over string
    // keys — interleaved A/B at sf0.1 measured cpu 27.9 -> 19.4 s and
    // wall floor 5.0 -> 4.7 s from dropping it. Both sides are
    // checkpointed (no static stats), so the initial plan is sort-merge
    // — never the round-9 static mid-scale broadcast pathology — and
    // AQE re-plans from TRUE shuffle sizes (at sf1+ the posting table
    // exceeds the 32 MiB threshold, so no broadcast build returns).
    // The multi-tail semi-join stays UNHINTED for the same reason: AQE
    // broadcasts the small pair-id list at ladder scale and falls back
    // to a shuffle join if the tail ever grows.
    def sortedFold(term: Column): Column =
      aggregate(sort_array(collect_list(struct(col("w"), term.as("t")))),
        lit(0.0), (a, x) => a + x.getField("t"))
    // norm² through the native [[graft.plans.SortedKeyDot]] self-merge:
    // Σ t·t over the w-sorted array is the identical IEEE sequence the
    // interpreted sortedFold(wt²) HOF produced, at ~1/5 the cost
    // (codegen'd two-pointer loop vs per-element lambda interpretation).
    def sortedKeyNorms(postings: DataFrame): DataFrame = postings.groupBy("id")
      .agg(sort_array(collect_list(struct(col("w"), col("wt").as("t")))).as("arr"))
      .select(col("id"), graft.plans.SortedKeyDot(col("arr"), col("arr")).as("n2"))
    val norms = sortedKeyNorms(wt)
    val post = wt.join(norms, "id")
    // The pair aggregation shuffles WITHOUT the token string — and
    // (round 13) without a wide posting-pair checkpoint in between:
    // the w-keyed self-join streams STRAIGHT into the (id_a, id_b)
    // aggregation, so the ~n candidate pair-products are never
    // materialized with their trigram strings attached. A k=1 pair's
    // dot IS its one product (min(p) recovers it exactly), and a k=2
    // pair's dot is p1+p2 in EITHER order — IEEE addition is
    // commutative (only associativity fails), so plain sum(p) is
    // bit-identical to the w-ascending fold. pairAgg feeds all
    // branches — checkpoint so the join+groupBy runs once.
    val pairAgg = post.as("x").join(post.as("y"),
        col("x.w") === col("y.w") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        (col("x.wt") * col("y.wt")).as("p"),
        col("x.n2").as("na2"), col("y.n2").as("nb2"))
      .groupBy("id_a", "id_b").agg(
        count(lit(1)).as("k"), min("p").as("p1"), sum("p").as("sp"),
        min("na2").as("na2"), min("nb2").as("nb2"))
      // the k<=2 cosine folds into the aggregation output so the
      // checkpoint (and the final top-k scan) carries 4 narrow columns,
      // not dots and norms
      .select(col("id_a"), col("id_b"), col("k"),
        round(when(col("k") === 1, col("p1")).otherwise(col("sp")) /
          (sqrt(col("na2")) * sqrt(col("nb2"))), 6).as("cosine"))
      .localCheckpoint(true)
    val smallK = pairAgg.filter(col("k") <= 2).select("id_a", "id_b", "cosine")
    // Bound-pruned ordered refold (round 13, the Bayardo-spirit upper
    // bound the r12 verdict asked for): for a k>=3 pair the
    // aggregation's round(sum(p)/norms, 6) is already the true cosine
    // up to IEEE reorder error |sum(p) − orderedFold| ≤ (k−1)·ε·Σp
    // (every p > 0, so Σ|p| = Σp and the relative error is ≤ k·2⁻⁵² ≈
    // 2e-13 even at k in the thousands) — far inside the 6-dp rounding
    // grain, so the engine-pinned w-ascending refold value can differ
    // from the aggregation value by AT MOST one rounding step (1e-6).
    // That makes cosine ± 1e-6 a hard bound on the final value, and
    // the global top-K boundary computable BEFORE any refold:
    //   c_lo = the topK-th largest lower bound over all pairs
    //          (k<=2 values are exact; k>=3 values carry −1e-6).
    // At least topK pairs have true value ≥ their own lb ≥ c_lo, so a
    // k>=3 pair whose upper bound (cosine + 1e-6) falls BELOW c_lo is
    // strictly beaten by ≥ topK pairs — ties and id-tiebreaks cannot
    // rescue a strict loser — and is dropped without ever being
    // refolded. Only the boundary sliver (≈topK pairs, vs the full
    // 16k-pair k>=3 tail at sf1) pays the ordered refold, and every
    // EMITTED k>=3 cosine still comes from the w-ascending fold, so
    // the output is bit-identical to the unpruned plan.
    val cLo = pairAgg
      .select((col("cosine") -
        when(col("k") >= 3, lit(1e-6)).otherwise(lit(0.0))).as("lb"))
      .orderBy(col("lb").desc).limit(topK)
      .agg(coalesce(min("lb"), lit(-2.0)).as("c_lo"))
    val tailPairs = pairAgg.crossJoin(broadcast(cLo))
      .filter(col("k") >= 3 && col("cosine") + lit(1e-6) >= col("c_lo"))
      .select(col("id_a"), col("id_b"))
    // The refold recomputes its few pair-products from the narrow wt
    // checkpoint, pruned to the boundary docs by a broadcast id list —
    // a tiny join instead of a full posting-pair rescan (the old plan
    // kept every candidate pair checkpointed wide for exactly this
    // branch). Norms for these docs re-derive through the identical
    // SortedKeyDot fold, so they are the same IEEE values that rode
    // the posting rows.
    val tIds = tailPairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val wtT = wt.join(broadcast(tIds), "id")
    val normsT = sortedKeyNorms(wtT)
    val tail = wtT.as("x").join(wtT.as("y"),
        col("x.w") === col("y.w") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.w").as("w"), (col("x.wt") * col("y.wt")).as("p"))
      .join(broadcast(tailPairs), Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b").agg(sortedFold(col("p")).as("dot"))
      .join(broadcast(normsT.select(col("id").as("id_a"), col("n2").as("na2"))), "id_a")
      .join(broadcast(normsT.select(col("id").as("id_b"), col("n2").as("nb2"))), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))), 6).as("cosine"))
    val cos = smallK.unionByName(tail)
    import org.apache.spark.sql.expressions.Window
    cos.orderBy(col("cosine").desc, col("id_a"), col("id_b")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("id_a"), col("id_b"))).cast("long"))
  }

  /** BM25 hard-negative mining for retrieval training (the standard
    * dense-retriever recipe, e.g. Karpukhin et al. 2020 §3.2): per
    * query term, documents that score high lexically but MISS the
    * relevance bar (tf < `relTf`, the retrievalEval pseudo-qrel rule)
    * are the hard negatives — lexically confusable, labeled
    * non-relevant. Top `k` per term by (4-dp score, id) — the
    * rank-discipline that makes the ranking engine-exact.
    *
    * Scale shape: windows partition BY TERM over term-filtered
    * postings only (never the corpus), the retrievalEval posture; the
    * per-term score is a single closed-form expression (no cross-term
    * double sum), so scores are bit-identical across engines.
    */
  def bm25HardNegatives(docs: DataFrame, idCol: String, textCol: String,
                        terms: Seq[String], relTf: Long = 2, k: Int = 10,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("id"), split(lower(col(textCol)), " ").as("toks"))
    val base = perDoc.select(col("id"), size(col("toks")).cast("long").as("dl"),
      explode(col("toks")).as("term"))
    val tfs = base.filter(col("term").isInCollection(terms))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = perDoc.agg(count(lit(1)).as("n"), avg(size(col("toks"))).as("avglen"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val termScore = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avglen")))
    val negatives = tfs
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .filter(col("tf") < relTf)
      .select(col("term"), col("id"), col("tf"), round(termScore, 4).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("term").orderBy(col("score").desc, col("id"))
    negatives
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Top-k TF-IDF terms per document — keyword extraction for corpus
    * topic tagging / cluster labeling. Same economics as bm25TopK:
    * only (doc, term, count) triples shuffle, document frequencies
    * aggregate from the already-distinct (doc, term) table (no second
    * corpus pass), N rides along as a broadcast single-row frame, and
    * the per-doc top-k runs through the bounded-heap TopKPerKey
    * physical operator, not a full per-doc sort. Ranking compares the
    * ROUNDED score (term as tiebreak) so results are engine-exact.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    tfidfTopTermsReleasable(docs, idCol, textCol, k)._1

  /** tfidfTopTerms with a [[CacheHandle]] for the persisted tf table.
    *
    * The tf table is persisted because BOTH the document-frequency
    * aggregate and the scored join read it — unpersisted, each
    * consumer re-runs the corpus explode + (doc, term) shuffle, and
    * the sf1→sf3 ladder measured that as the operator's super-linear
    * term (6.1× at 3× data; with the cache + broadcast df the ratio
    * is the shuffle's ~linear growth). `dfreq` joins back BROADCAST:
    * it is vocab-sized (sub-linear in corpus), and the broadcast
    * keeps the docs×vocab tf table from re-shuffling on the term key
    * — at 100 TB pass `broadcastDf = false` if the vocabulary
    * outgrows executor memory and the term shuffle is the lesser
    * cost. The cache is (doc, term, count) triples — explode-sized
    * but far below raw tokens; DISK_ONLY knob as with BM25.
    */
  def tfidfTopTermsReleasable(docs: DataFrame, idCol: String, textCol: String, k: Int,
      broadcastDf: Boolean = true,
      storage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, CacheHandle) = {
    val handle = CacheHandle()
    val terms = docs.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("term"))
    val tf = handle.track(
      terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf")).persist(storage))
    val dfreq0 = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfreq = if (broadcastDf) broadcast(dfreq0) else dfreq0
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"),
        round(col("tf") * log(col("__n").cast("double") / col("df")), 4).as("tfidf"))
    (TopK.perKey(scored, Seq(idCol), struct((-col("tfidf")).as("neg"), col("term")), k), handle)
  }

  /** Corpus-level inverted-index BUILD: one row per term carrying
    * document frequency, total occurrences, and the full postings —
    * rendered as a canonical `doc:pos,pos;doc:pos` string (ordered by
    * doc id, positions ascending) so any engine reproduces the index
    * byte-for-byte. This is the search-index construction pass a
    * corpus-mining stack runs once per snapshot; lookups then join
    * terms instead of scanning text.
    *
    * Scale shape: one posexplode to (term, doc, pos) triples, one
    * (term, doc) aggregation with map-side combine, one vocab-keyed
    * aggregation. Stopword terms produce corpus-sized posting rows —
    * real deployments shard those lists (or drop stopwords upstream);
    * the per-term row IS the skew unit, which AQE splits at the
    * aggregation.
    */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val triples = docs.select(col(idCol).cast("long").as("doc"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("p0", "term")))
      .select(col("term"), col("doc"), (col("p0") + 1).as("pos"))
    val perDoc = triples.groupBy("term", "doc")
      .agg(count(lit(1)).as("tf"),
        array_join(transform(array_sort(collect_list(col("pos"))), _.cast("string")), ",").as("poss"))
    perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("n_occ"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc"), col("poss")))),
          x => concat(x.getField("doc").cast("string"), lit(":"), x.getField("poss"))),
          ";").as("postings"))
  }

  /** (w1, w2) adjacent-word pair rows from a corpus — the shared edge
    * source for the word co-occurrence graph operators (TextRank
    * keywords, triangle counting); one definition so tokenization or
    * filtering fixes can't drift between them.
    */
  private[operators] def adjacentPairRows(docs: DataFrame, textCol: String): DataFrame = {
    // The token array is projected once and the pair lambda touches only
    // that attribute: inlining `ws = split(...)` into the lambda re-split
    // the text per emitted pair (no CSE inside HOF lambdas — the
    // NgramShingles lesson), measured 4.3 s -> 0.8 s at sf0.1 for this
    // explode alone. Same rows, bit-identical (spec-pinned).
    docs.select(split(lower(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__ws")) - 1, lit(1)),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** PMI collocations (Church & Hanks 1990): pointwise mutual
    * information of adjacent word pairs against their unigram
    * frequencies — the classic collocation extractor ("strongly
    * associated bigrams") a corpus-profiling pass reports next to
    * top n-grams. PMI = log2(c12·N / (c1·c2)) over exact token
    * counts; min-count floor kills the low-frequency PMI explosion.
    * One corpus explode; the unigram join keys on vocab-bounded
    * tables; output is a deterministic bounded top-k (rounded PMI,
    * then lexicographic).
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Long, k: Int): DataFrame = {
    val pairs = adjacentPairRows(docs, textCol)
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = docs.select(explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val tot = c12.agg(sum("c12").as("np"))
    c12.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"),
        round(log2(col("c12").cast("double") * col("np").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    * over the corpus-wide word co-occurrence graph — adjacent content
    * words (lowercase alphabetic, length >= 3) become an undirected
    * edge, and the stationary rank surfaces the corpus's central
    * vocabulary. The LLM-pipeline use is corpus topic labeling and
    * stopword-free keyword lists for cluster naming — graph centrality
    * finds terms TF-IDF misses (a hub word with middling frequency).
    *
    * Scale shape: the corpus explodes once to adjacent pairs, which
    * collapse to the DISTINCT vocabulary-bounded edge set before any
    * iteration — PageRank then runs on (long, long) ids, never words
    * (vertex ids are xxhash64(word): rank depends only on graph
    * structure, so any collision-free labeling yields identical
    * ranks; ~n²/2^64 collision odds on a vocabulary are negligible —
    * and the word itself joins back only for the final top-k). The
    * co-occurrence pair table is checkpointed so the corpus scan runs
    * once, not once per consumer.
    */
  def textRankKeywords(docs: DataFrame, textCol: String, k: Int,
                       iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val wordRe = "^[a-z]{3,}$"
    val pairs = adjacentPairRows(docs, textCol)
      .filter(col("w1") =!= col("w2") &&
        col("w1").rlike(wordRe) && col("w2").rlike(wordRe))
      .select(least(col("w1"), col("w2")).as("a"), greatest(col("w1"), col("w2")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val edges = pairs.select(xxhash64(col("a")).as("src"), xxhash64(col("b")).as("dst"))
      .unionByName(pairs.select(xxhash64(col("b")).as("src"), xxhash64(col("a")).as("dst")))
    val words = pairs.select(col("a").as("word")).unionByName(pairs.select(col("b").as("word")))
      .distinct()
      .select(col("word"), xxhash64(col("word")).as("id"))
    Graph.pageRank(edges, "src", "dst", iters, damping)
      .join(words, "id")
      .select(col("word"), col("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(k)
  }

  /** Kneser-Ney smoothed bigram LM score (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1998) — the standard upgrade
    * over the MLE bigram scorer: mass discounted from seen bigrams is
    * redistributed by CONTINUATION probability (how many distinct
    * contexts a word follows), so boilerplate that always follows one
    * context stops looking like fluent text and rare-but-natural
    * continuations stop being punished. Per-doc score = mean log2
    * P_KN over the doc's bigrams,
    *
    *   P_KN(w2|w1) = (max(c12 − d, 0) + d·N1+(w1·)·Pcont(w2)) / c(w1·)
    *   Pcont(w2)   = N1+(·w2) / |distinct bigrams|
    *
    * with d = 0.75 (exact in binary: c12 − d and every product chain
    * are the same float expressions in any engine, so the rounded
    * score reproduces). Every count is derivable from ONE persisted
    * pair table — c(w1·) and N1+(w1·) from the h1 group, N1+(·w2)
    * from the h2 group, the pair total from one count — so the corpus
    * explodes exactly once and everything downstream is vocab-sized
    * (same economics as bigramLmScore; same xxhash64 hashed-token
    * shuffle, same DISK_ONLY storage knob at 100 TB).
    */
  def kneserNeyScore(docs: DataFrame, idCol: String, textCol: String,
                     discount: Double = 0.75): DataFrame =
    kneserNeyScoreReleasable(docs, idCol, textCol, discount)._1

  /** kneserNeyScore with a [[CacheHandle]] for the persisted pair
    * table (see bigramLmScoreReleasable for the storage contract).
    */
  def kneserNeyScoreReleasable(docs: DataFrame, idCol: String, textCol: String,
                               discount: Double = 0.75,
                               storage: org.apache.spark.storage.StorageLevel =
                                 org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, CacheHandle) = {
    val handle = CacheHandle()
    val pairs = handle.track(docs
      // tokenize once into a projection (the adjacentPairRows lesson:
      // an inline `ws` re-splits the text per emitted pair)
      .select(col(idCol), split(lower(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__ws")) - 1, lit(1)),
          i => struct(element_at(col("__ws"), i).as("w1"),
            element_at(col("__ws"), i + 1).as("w2")))).as("bg"))
      .select(col(idCol), xxhash64(col("bg.w1")).as("h1"),
        xxhash64(col("bg.w2")).as("h2"),
        xxhash64(col("bg.w1"), col("bg.w2")).as("h12"))
      .persist(storage))
    // h1/h2 are functionally dependent on h12; grouping by all three
    // keeps them available without a second pass.
    val bc = pairs.groupBy("h12", "h1", "h2").agg(count(lit(1)).as("c12"))
    val left = bc.groupBy("h1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1w"))
    val cont = bc.groupBy("h2").agg(count(lit(1)).as("n1dw"))
    val total = bc.agg(count(lit(1)).as("npairs"))
    val d = lit(discount)
    val lm = bc.join(left, "h1").join(cont, "h2").crossJoin(broadcast(total))
      .select(col("h12"),
        ((greatest(col("c12") - d, lit(0.0)) +
          d * col("n1w") * (col("n1dw").cast("double") / col("npairs"))) / col("c1")).as("p"))
    val scored = pairs.join(lm, Seq("h12"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg(log2(col("p"))), 4).as("kn_log2p"))
    (scored, handle)
  }

  /** Corpus-self bigram LM quality score (the CCNet idea with the
    * corpus as its own LM): train bigram conditionals P(w2|w1) =
    * c(w1,w2)/c(w1·) over the whole corpus, then score each document
    * by its mean log2 bigram probability. Boilerplate scores high
    * (its bigrams dominate the corpus), character soup scores low —
    * a quality axis independent of the length/stopword heuristics.
    *
    * Scale shape: bigrams travel as xxhash64 tokens — h1 = hash(w1),
    * h12 = hash(w1, w2) — so the two count aggregations and the LM
    * join back shuffle (long, long) rows, never words (the same
    * collision arithmetic as duplicateWindowStats: ~3e4 expected
    * 64-bit collisions among 10^12 bigrams perturbs a per-doc MEAN
    * log-probability at the 1e-8 level). Map-side combine applies to
    * both counts; the LM table is vocabulary-sized, not corpus-sized.
    * Docs with < 2 tokens have no bigrams and drop out, as in the
    * oracle.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramLmScoreReleasable(docs, idCol, textCol)._1

  /** bigramLmScore with a [[CacheHandle]] for the persisted pair table
    * (see CacheHandle's doc for the contract).
    *
    * `storage`: the pair table is ~24 bytes per corpus TOKEN — at
    * 100 TB pass StorageLevel.DISK_ONLY (see bm25TopKReleasable).
    */
  def bigramLmScoreReleasable(docs: DataFrame, idCol: String, textCol: String,
                              storage: org.apache.spark.storage.StorageLevel =
                                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, CacheHandle) = {
    val handle = CacheHandle()
    // Persisted: `pairs` feeds BOTH the LM count aggregation and the
    // final scoring join, and the two consumers partition differently
    // ((h12,h1) vs h12) so no exchange is reusable between them — an
    // unpersisted plan runs the corpus explode + hash pass TWICE,
    // measured as ~2x the whole query. Cached rows are (id, long,
    // long) — the hashes, never the words.
    val pairs = handle.track(docs
      // tokenize once into a projection (the adjacentPairRows lesson);
      // single-token docs filtered first: sequence(1, 0) throws rather
      // than yield [] (and a NULL-w2 pair would pollute c(w1·) counts)
      .select(col(idCol), split(lower(col(textCol)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__ws")) - 1, lit(1)),
          i => struct(element_at(col("__ws"), i).as("w1"),
            element_at(col("__ws"), i + 1).as("w2")))).as("bg"))
      // hash AFTER the explode, in the codegen projection — hashing
      // inside the transform() lambda runs interpreted per element and
      // measured 35% slower than not hashing at all
      .select(col(idCol), xxhash64(col("bg.w1")).as("h1"),
        xxhash64(col("bg.w1"), col("bg.w2")).as("h12"))
      .persist(storage))
    // h1 is functionally dependent on h12 (same w1), so grouping by
    // both keeps it available without a second pass or a first() agg;
    // the w1-marginal c(w1·) then aggregates the VOCAB-sized bigram
    // table, not a third pass over the corpus explode.
    val bigramCounts = pairs.groupBy("h12", "h1").agg(count(lit(1)).as("c2"))
    val firstCounts = bigramCounts.groupBy("h1").agg(sum(col("c2")).as("c1"))
    val lm = bigramCounts
      .join(firstCounts, "h1")
      .select(col("h12"), (col("c2").cast("double") / col("c1")).as("p"))
    val scored = pairs.join(lm, Seq("h12"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg(log2(col("p"))), 4).as("avg_log2p"))
    (scored, handle)
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabK` word vocabulary — the tokenizer-planning signal: a
    * doc whose tokens mostly miss the frequency-built vocab will
    * fragment into subwords (high fertility) or unks, and a SOURCE
    * whose OOV rate is high is a candidate for its own vocab budget.
    *
    * Scale shape: the corpus explodes ONCE into the per-doc term-
    * frequency table; the global counts, the top-K vocabulary (a
    * TakeOrdered over the vocab-sized count table, deterministic
    * (count desc, word) order), and the per-doc rollup all derive from
    * that tf table — docs × distinct-words-sized, far below raw
    * tokens. The vocab joins back broadcast, so nothing corpus-sized
    * shuffles twice. OOV rate compares exact integer counts; the
    * rounded ratio reproduces in any engine.
    */
  /** RAKE keyphrase extraction (Rose et al. 2010), corpus-level:
    * candidate phrases are the maximal runs between stopwords and
    * punctuation; each word scores deg/freq (deg = Σ length of the
    * phrases it occurs in, freq = occurrence count — rewarding words
    * that live inside LONG multi-word phrases); a phrase scores the
    * sum of its words' scores. The classic zero-training keyphrase
    * extractor — unlike TF-IDF terms it surfaces multi-word
    * technical phrases, unlike TextRank it needs no graph iteration.
    *
    * Scale shape: the corpus explodes ONCE, straight into the
    * phrase-count aggregation (map-side combined), and that DISTINCT
    * phrase table — materialized, vocab-sized — derives everything
    * else: word stats come from the weighted (word, n, plen) explode
    * of the distinct phrases (freq = Σn, deg = Σn·plen — exactly the
    * per-occurrence sums, integer-exact), and phrase scores join the
    * broadcast word stats back on. Nothing corpus-sized is evaluated
    * twice or shuffled twice; no iteration exists. Determinism:
    * deg/freq is a ratio of exact integers; the phrase-score sum
    * rounds to 6 dp before the (score desc, phrase) rank, so both
    * engines cut the same top-k.
    */
  def rakeKeyphrases(docs: DataFrame, textCol: String,
                     stopwords: Seq[String], k: Int): DataFrame = {
    // The stopword list is interpolated into a regex alternation on
    // BOTH engines (here and the DuckDB oracle render) — an entry
    // with a regex metacharacter ("c++", "a.m.") would silently
    // corrupt phrase splitting on both sides, so reject it outright.
    require(stopwords.forall(_.matches("[a-z0-9]+")),
      s"stopwords must be plain [a-z0-9]+ words (regex-interpolated): " +
        stopwords.filterNot(_.matches("[a-z0-9]+")).mkString(", "))
    val marked = regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]+", "|"),
      s"\\b(${stopwords.mkString("|")})\\b", "|")
    val phrases = filter(
      transform(split(marked, "\\|"), p => trim(regexp_replace(p, "\\s+", " "))),
      p => p =!= "")
    // The ONLY corpus-sized pass: explode → phrase counts. Checkpointed
    // because it feeds two consumers (word stats + score join) — an
    // unpersisted plan would re-run the regexp chain over the corpus
    // per consumer (the q_modularity lazy-lineage lesson).
    val pcount = docs.select(explode(phrases).as("phrase"))
      .groupBy("phrase").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val wordStats = pcount
      .select(col("n"), split(col("phrase"), " ").as("ws"))
      .select(col("n"), size(col("ws")).cast("long").as("plen"), explode(col("ws")).as("word"))
      .groupBy("word")
      .agg(sum(col("n")).as("freq"), sum(col("n") * col("plen")).as("deg"))
      .select(col("word"), (col("deg").cast("double") / col("freq")).as("wscore"))
    pcount
      .select(col("phrase"), col("n"), explode(split(col("phrase"), " ")).as("word"))
      .join(broadcast(wordStats), "word")
      .groupBy("phrase", "n")
      .agg(round(sum(col("wscore")), 6).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
  }

  def oovRate(docs: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("w").agg(sum(col("tf")).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(vocabK)
      .select(col("w"), lit(1).as("__iv"))
    tf.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(idCol)
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("__iv").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 4).as("oov_rate"))
  }

  /** Retrieval-quality evaluation: nDCG@k, MRR and recall@k of a
    * per-term BM25 ranking against derived binary relevance judgments
    * (relevant = the term occurs ≥ `relMin` times in the document —
    * the standard pseudo-qrel construction when no human judgments
    * exist). One corpus tokenization feeds run AND qrels; rankings
    * are per-term windows over the term-filtered posting rows only
    * (corpus text never shuffles). Scores round to 4 dp before
    * ranking with doc-id tiebreak — the proven bm25TopK discipline —
    * so the ranked list is engine-exact; DCG/IDCG are sums of ≤ k
    * closed-form terms, rounded at 6 dp.
    */
  def retrievalEval(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], k: Int, relMin: Long,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = docs.select(col(idCol).as("id"),
      split(lower(col(textCol)), " ").as("toks"))
    val base = perDoc.select(col("id"), size(col("toks")).cast("long").as("dl"),
      explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(terms))
    val tfs = base.groupBy("id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = perDoc.agg(count(lit(1)).as("n"),
      avg(size(col("toks"))).as("avglen"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val termScore = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avglen")))
    val scored = tfs.join(broadcast(dfs), "term").crossJoin(broadcast(stats))
      .select(col("term"), col("id"), col("tf"),
        round(termScore, 4).as("score"))
    val wRank = Window.partitionBy("term").orderBy(col("score").desc, col("id"))
    val ranked = scored
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("rel", col("tf") >= relMin)
    val nRel = tfs.filter(col("tf") >= relMin)
      .groupBy("term").agg(count(lit(1)).as("n_rel"))
    val logTerm = (r: Column) => lit(1.0) / log2(r.cast("double") + 1.0)
    ranked.groupBy("term")
      .agg(sum(when(col("rel"), 1L).otherwise(0L)).as("n_ret_rel"),
        min(when(col("rel"), col("rank"))).as("first_rel"),
        sum(when(col("rel"), logTerm(col("rank"))).otherwise(lit(0.0))).as("dcg"))
      .join(broadcast(nRel), Seq("term"), "left")
      .select(col("term"), coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("n_ret_rel"),
        round(coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0)), 6).as("mrr"),
        round(col("n_ret_rel").cast("double") / col("n_rel").cast("double"), 6).as("recall_at_k"),
        round(col("dcg") / aggregate(
          sequence(lit(1L), least(lit(k.toLong), col("n_rel"))),
          lit(0.0), (acc, i) => acc + logTerm(i)), 6).as("ndcg_at_k"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Ponte & Croft
    * 1998; Zhai & Lafferty 2001): score(w, d) = ln((tf + μ·cf_w/|C|)
    * /(|d| + μ)) — the language-modeling scorer that complements BM25
    * (they disagree most on long documents, which Dirichlet smoothing
    * penalizes less). Candidates are posting-bounded (docs containing
    * the term; the smoothing mass alone never promotes a non-matching
    * doc into a single-term top-k since the score is monotone in tf),
    * corpus stats are one broadcast row, ranking is the BM25 twin's
    * 4-dp-rounded score with the doc-id tiebreak.
    */
  def dirichletQl(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], mu: Double, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = docs.select(col(idCol).as("id"),
      split(lower(col(textCol)), " ").as("toks"))
    val base = perDoc.select(col("id"), size(col("toks")).cast("long").as("dl"),
      explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(terms))
    val tfs = base.groupBy("id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val cfs = tfs.groupBy("term").agg(sum("tf").as("cf"))
    val clen = perDoc.agg(sum(size(col("toks")).cast("long")).as("clen"))
    val score = log(
      (col("tf").cast("double") + lit(mu) * col("cf").cast("double") /
        col("clen").cast("double")) /
        (col("dl").cast("double") + lit(mu)))
    val scored = tfs.join(broadcast(cfs), "term").crossJoin(broadcast(clen))
      .select(col("term"), col("id"), col("tf"), round(score, 4).as("score"))
    val wRank = Window.partitionBy("term").orderBy(col("score").desc, col("id"))
    scored.withColumn("doc_rank", row_number().over(wRank).cast("long"))
      .filter(col("doc_rank") <= k)
  }

  /** logDice collocation strength (Rychlý 2008, the Sketch Engine
    * standard): 14 + log2(2·f_xy/(f_x+f_y)) — unlike PMI it does not
    * blow up on rare pairs and is corpus-size independent, so scores
    * COMPARE across corpora (the property PMI lacks). Same adjacent-
    * pair/unigram machinery as [[pmiCollocations]].
    */
  def logDiceCollocations(docs: DataFrame, textCol: String,
                          minCount: Long, k: Int): DataFrame = {
    val pairs = adjacentPairRows(docs, textCol)
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = docs.select(explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    c12.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), "w2")
      .select(col("w1"), col("w2"), col("c12"),
        round(lit(14.0) + log2(lit(2.0) * col("c12").cast("double") /
          (col("c1") + col("c2")).cast("double")), 4).as("logdice"))
      .orderBy(col("logdice").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Keyword-in-context concordance (the corpus-linguistics KWIC
    * view): for each query term, the first `kPerTerm` occurrences in
    * (doc, position) order with `ctx` tokens of left/right context —
    * the "show me how this word is actually used" tool every corpus
    * audit reaches for. One token explode; context windows are
    * per-row array slices (no self-join); head selection through the
    * bounded-heap TopK, so occurrence-rich terms never sort.
    */
  def kwic(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], ctx: Int, kPerTerm: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
        split(lower(col(textCol)), " ").as("ws"))
      .select(col("id"), col("ws"), posexplode(col("ws")).as(Seq("p0", "term")))
      .filter(col("term").isInCollection(terms))
      .select(col("term"), col("id"), (col("p0") + 1).cast("long").as("pos"),
        array_join(slice(col("ws"),
          greatest(col("p0") + 1 - ctx, lit(1)), least(lit(ctx), col("p0"))), " ")
          .as("left_ctx"),
        array_join(slice(col("ws"), col("p0") + 2, lit(ctx)), " ").as("right_ctx"))
    TopK.perKey(base, Seq("term"),
      struct(col("id").as("a"), col("pos").as("b")), kPerTerm)
  }
}
