package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Wider analytics surface: as-of join, rollup, pivot, exact
  * percentiles, set operations, range (non-equi) join, embedding
  * near-dup (SURVEY.md §2 additions beyond the reference's own ops).
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** PageRank's shared edge definition: the supplier→part supply
    * graph from lineitem (parts offset into a disjoint id space).
    * Directed one way, so every part vertex is dangling — the oracle
    * exercises the dangling-mass redistribution path, not just the
    * contribution sum.
    */
  private val pagerankEdgeCteDuck =
    """e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS src, l_partkey + 1000000000 AS dst FROM lineitem)"""

  /** q_kcore parameters, shared with the unrolled oracle. k sits below
    * the part-bucket side's degree ceiling (≈ the supplier count at
    * sf0.01) so the peel is non-trivial at every harness sf; the
    * result is oracle-exact at ANY (k, rounds) since both engines run
    * the identical fixed rounds.
    */
  private val kCoreK = 60
  private val kCoreRounds = 4
  private val kcoreEdgeCteDuck =
    """e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS u, l_partkey % 300 + 1000000000 AS v FROM lineitem)"""

  /** q_ktruss parameters, shared with the unrolled oracle. The word
    * co-occurrence graph (same one q_triangles counts) carries real
    * triangles; k−2 = 3 keeps a non-trivial dense core at every
    * harness sf; exact at ANY (k, rounds) since both engines run the
    * identical fixed peel.
    */
  private val kTrussK = 5
  private val kTrussRounds = 3
  private val ktrussEdgeCteDuck =
    """w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
      |p0 AS (SELECT unnest(list_transform(range(1, len(ws)),
      |         i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS u FROM w WHERE len(ws) >= 2),
      |e0 AS MATERIALIZED (SELECT DISTINCT least(u.w1, u.w2) AS a, greatest(u.w1, u.w2) AS b
      |      FROM p0 WHERE u.w1 <> u.w2)""".stripMargin

  /** Surname pool for q_record_linkage (shared with its oracle). */
  private val linkSurnameList = Seq(
    "miller", "smith", "garcia", "johnson", "brown", "davis",
    "wilson", "moore", "taylor", "thomas", "martin", "clark")
  private val linkSurnames = array(linkSurnameList.map(lit): _*)

  val queries: Map[String, Q] = Map(
    // #97 range-partitioned GLOBAL ranking as a first-class query: the
    // two-pass GlobalRank row number over the whole customer table,
    // oracle-checked against row_number() — the operator the
    // ntile/average-precision/sweep-line family now runs on, proven
    // at driver grain with no unpartitioned window in the plan.
    "q_rank_global" -> { (s, dir) =>
      GlobalRank.rowNumbers(
        Tables(s, dir).customer.select("c_custkey", "c_acctbal"),
        Nil, Seq(col("c_acctbal").desc, col("c_custkey")), "rn").df
        .select(col("c_custkey"), col("rn"))
    },

    // #97b global running total (cents-exact) via GlobalRank's
    // range-partitioned running sums — cumulative revenue in order
    // date order without a single-task sort.
    "q_running_total" -> { (s, dir) =>
      val o = Tables(s, dir).orders.select(col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      GlobalRank.rowNumbers(o, Nil, Seq(col("o_orderdate"), col("o_orderkey")), "rn",
        running = Seq(("cents", "cum_cents"))).df
        .select(col("o_orderkey"), col("cum_cents"))
    },

    // #97c GLOBAL lag without an unpartitioned window: GlobalRank row
    // numbers over the corpus-wide (ts, event_id) order, then an
    // equi-join on rn = rn−1 — the lag/lead family at cluster scale
    // (each successor pair meets in a hash-partitioned join on rn;
    // nothing sorts the corpus on one task). Emits every event's gap
    // to its globally previous event, q_interarrival's per-key gap
    // statistic lifted to the whole stream.
    "q_global_lag" -> { (s, dir) =>
      val e = Tables(s, dir).events.select(col("event_id"), col("ts"))
      val ranked = GlobalRank.rowNumbers(e, Nil, Seq(col("ts"), col("event_id")), "rn").df
      val prev = ranked.select((col("rn") + 1L).as("rn"), col("ts").as("__prev"))
      ranked.join(prev, "rn")
        .select(col("event_id"),
          ((unix_millis(col("ts")) - unix_millis(col("__prev"))) / 1000.0).as("gap_s"))
    },

    // PageRank over the supplier→part graph: fixed power iterations,
    // dangling mass redistributed uniformly. Edges hash-partitioned
    // once and reused each round; ranks are the only per-round shuffle.
    "q_pagerank" -> { (s, dir) =>
      // shared memoized assets (GraphAssets): the distinct
      // supplier→part build, its vertex set AND the degree-augmented
      // iteration table are each paid once per (session, dir) — the
      // query itself is just the power-iteration rounds
      val t = Tables(s, dir)
      Graph.pageRankIterate(GraphAssets.supplierPartAug(t),
        GraphAssets.supplierPartNodes(t), iters = 3, damping = 0.85)
    },

    // k-core peel over the supplier→part-bucket graph: minimum-degree
    // nucleus that survives deletion cascades (a plain degree filter
    // does not — peeling a vertex can push neighbors below k). Fixed
    // rounds, oracle unrolled from the same (k, rounds).
    "q_kcore" -> { (s, dir) =>
      val edges = Tables(s, dir).lineitem.select(
        col("l_suppkey").cast("long").as("src"),
        (pmod(col("l_partkey"), lit(300)) + 1000000000L).as("dst"))
      Graph.kCore(edges, "src", "dst", k = kCoreK, rounds = kCoreRounds)
        .orderBy("id")
    },

    // Record linkage: Soundex-blocked fuzzy join, never all-pairs.
    // Soundex alone has ~9k keys, so blocking is COMPOUND (the
    // standard census design): phonetic key AND an exact attribute
    // (here a birth-cohort stand-in both sides share) — measured
    // without it, the bounded key space made in-block pairs grow
    // super-linearly the moment the corpus outgrew the key count
    // (20x wall at 10x data on the first construction). Names lead
    // with reversed low-order digits so even within a cohort the
    // phonetic keys spread. Planted twins append a vowel (same
    // Soundex, distance 1 — found), every 5th is reversed (different
    // block — the documented blocking miss). Chain + levenshtein
    // reproduce in DuckDB.
    // #67b sorted-neighborhood linkage (Hernández & Stolfo 1995) on
    // the same synthesized corpus: one global name sort, window 3,
    // candidates = exactly 2 per record — the tightest-candidate
    // blocking family, spec'd to MISS the reversed-name variants by
    // design (that is the method's documented trade-off).
    "q_sorted_neighborhood" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val name = concat(
        translate(reverse(col("c_custkey").cast("string")), "0123456789", "BCDLMRFGST"),
        element_at(linkSurnames, pmod(col("c_custkey"), lit(12)).cast("int") + 1))
      val left = c.select(col("c_custkey").as("id"), name.as("name"))
      val right = c.select((col("c_custkey") + 1000000L).as("id"),
        when(pmod(col("c_custkey"), lit(5)) === 0, reverse(name))
          .otherwise(concat(name, lit("e"))).as("name"))
      Linkage.sortedNeighborhood(left.unionByName(right), "id", "name",
        window = 3, minJw = 0.9)
    },

    // #67c Fellegi-Sunter probabilistic scoring over the sorted-
    // neighborhood candidates: m/u rates learned from the planted
    // truth (|id_a − id_b| = 1e6), three agreement fields, log₂
    // likelihood-ratio decision weights.
    "q_fellegi_sunter" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val name = concat(
        translate(reverse(col("c_custkey").cast("string")), "0123456789", "BCDLMRFGST"),
        element_at(linkSurnames, pmod(col("c_custkey"), lit(12)).cast("int") + 1))
      val left = c.select(col("c_custkey").as("id"), name.as("name"))
      val right = c.select((col("c_custkey") + 1000000L).as("id"),
        when(pmod(col("c_custkey"), lit(5)) === 0, reverse(name))
          .otherwise(concat(name, lit("e"))).as("name"))
      val cand = Linkage.sortedNeighborhood(left.unionByName(right), "id", "name",
        window = 3, minJw = 0.0)
        .withColumn("ag_surname", regexp_extract(col("name_a"), "[a-z]+$", 0) ===
          regexp_extract(col("name_b"), "[a-z]+$", 0))
        .withColumn("ag_prefix", substring(col("name_a"), 1, 3) ===
          substring(col("name_b"), 1, 3))
        .withColumn("ag_len", length(col("name_a")) === length(col("name_b")))
      Linkage.fellegiSunter(cand, abs(col("id_a") - col("id_b")) === 1000000L,
        Seq("ag_surname", "ag_prefix", "ag_len"))
    },

    "q_record_linkage" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val name = concat(
        translate(reverse(col("c_custkey").cast("string")), "0123456789", "BCDLMRFGST"),
        element_at(linkSurnames, pmod(col("c_custkey"), lit(12)).cast("int") + 1))
      val cohort = pmod(col("c_custkey"), lit(9973)).as("cohort")
      val left = c.select(col("c_custkey").as("id_a"), name.as("name_a"), cohort)
      val right = c.select((col("c_custkey") + 1000000L).as("id_b"),
        when(pmod(col("c_custkey"), lit(5)) === 0, reverse(name))
          .otherwise(concat(name, lit("e"))).as("name_b"), cohort)
      Linkage.blockedFuzzyJoin(left, right, "id_a", "name_a", "id_b", "name_b",
        maxDist = 2, extraBlockCols = Seq("cohort"))
    },

    // Record linkage scored with the native Jaro-Winkler expression
    // (plans/JaroWinkler — Spark ships no jaro): same synthesized
    // name corpus as q_record_linkage. Blocking is DATA-DERIVED: the
    // leading UPPERCASE RUN of each side's OWN name (the
    // digit-translated prefix; surnames are lowercase, so the run
    // ends where the surname starts). An earlier id-arithmetic block
    // (cohort mod 9973 x surname-class mod 12) was a bounded
    // ~120k-key space — fine at sf1, quadratic again at 100x
    // (round-6 verdict #3); a fixed-length name prefix has the dual
    // flaw (ScaleUp's key-shifted copies share any fixed prefix of
    // the reversed digits → factor² candidate growth on the ladder).
    // The uppercase run is the WHOLE digit part — injective per
    // custkey — so the key space grows linearly with the corpus and
    // blocks stay O(1) at any scale. The append-'e' distortion
    // preserves it (lowercase, at the end); the every-5th reversed
    // name starts lowercase (reversed surname), yielding an empty
    // run that is filtered pre-join — the documented blocking-miss
    // class, same as q_record_linkage's. Keep jw ≥ 0.85. The DuckDB
    // oracle scores with its OWN independent
    // jaro_winkler_similarity implementation, so a hash-match
    // cross-validates the native expression's exact semantics
    // (byte-wise, integer transposition halving, 0.7 boost gate).
    "q_jaro_linkage" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val name = concat(
        translate(reverse(col("c_custkey").cast("string")), "0123456789", "BCDLMRFGST"),
        element_at(linkSurnames, pmod(col("c_custkey"), lit(12)).cast("int") + 1))
      val left = c.select(col("c_custkey").as("id_a"), name.as("name_a"),
        regexp_extract(name, "^[A-Z]+", 0).as("blk"))
      val nameB = when(pmod(col("c_custkey"), lit(5)) === 0, reverse(name))
        .otherwise(concat(name, lit("e")))
      val right = c.select((col("c_custkey") + 1000000L).as("id_b"),
        nameB.as("name_b"), regexp_extract(nameB, "^[A-Z]+", 0).as("blk"))
        // empty run = reversed-name rows: they can match no left key
        // (left names always lead uppercase) — dropping them pre-join
        // avoids piling the whole miss class onto one shuffle key
        .filter(col("blk") =!= "")
      left.join(right, Seq("blk")).drop("blk")
        .select(col("id_a"), col("id_b"),
          round(graft.plans.JaroWinkler(col("name_a"), col("name_b")), 6).as("jw"))
        .filter(col("jw") >= 0.85)
    },

    // Transposition-aware linkage with the native TRUE
    // Damerau-Levenshtein (plans/DamerauLevenshtein): every 5th right
    // name carries an adjacent-swap typo — the most common human typo
    // class — which dl scores 1 where levenshtein says 2, so the
    // emitted (lev, dl) pairs document exactly the class the new
    // distance wins on. Blocking is DATA-DERIVED and SWAP-INVARIANT:
    // sorted(first 2 chars) + the remaining uppercase run from char 3
    // of each side's own name. A plain prefix block would drop
    // exactly the first-two-swap pairs the query showcases; sorting
    // the leading character pair makes the key invariant under that
    // swap, while the uppercase run (the digit-translated id part —
    // surnames are lowercase) makes the key injective per custkey up
    // to that one swap, so the key space grows linearly with the
    // corpus and blocks stay O(1) at any scale (the old
    // id-arithmetic cohort x surname-class block was a bounded
    // ~120k-key space — quadratic again at 100x, round-6 verdict #3;
    // a fixed-length prefix collapses ScaleUp's key-shifted copies
    // into factor-sized blocks). Append-'e' lands after the run and
    // cannot move the key. Oracle cross-validates against DuckDB's
    // own independent damerau_levenshtein.
    "q_damerau_linkage" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val name = concat(
        translate(reverse(col("c_custkey").cast("string")), "0123456789", "BCDLMRFGST"),
        element_at(linkSurnames, pmod(col("c_custkey"), lit(12)).cast("int") + 1))
      def blkOf(nm: Column): Column = concat(
        least(substring(nm, 1, 1), substring(nm, 2, 1)),
        greatest(substring(nm, 1, 1), substring(nm, 2, 1)),
        regexp_extract(substring(nm, 3, 1000), "^[A-Z]*", 0))
      val named = c.select(col("c_custkey").as("ck"), name.as("nm"))
      val left = named.select(col("ck").as("id_a"), col("nm").as("name_a"),
        blkOf(col("nm")).as("blk"))
      val nameB = when(pmod(col("ck"), lit(5)) === 0,
        concat(substring(col("nm"), 2, 1), substring(col("nm"), 1, 1),
          substring(col("nm"), 3, 1000)))
        .otherwise(concat(col("nm"), lit("e")))
      val right = named.select((col("ck") + 1000000L).as("id_b"),
        nameB.as("name_b"), blkOf(nameB).as("blk"))
      left.join(right, Seq("blk")).drop("blk")
        .select(col("id_a"), col("id_b"),
          levenshtein(col("name_a"), col("name_b")).as("lev"),
          graft.plans.DamerauLevenshtein(col("name_a"), col("name_b")).as("dl"))
        .filter(col("dl") <= 2)
    },

    // Snapshot diff between harvest runs: the "new" snapshot plants
    // every 7th price changed, every 13th key removed, and a shifted
    // id block added — one full-outer join, status per key.
    "q_snapshot_diff" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val newSnap = o.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderstatus"))
        .unionByName(o.filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus")))
      DataOps.snapshotDiff(o, newSnap, "o_orderkey", Seq("o_totalprice", "o_orderstatus"))
    },

    // #42bn PSI drift between harvest snapshots per source: an
    // md5-parity half-split of each source plays the old/new halves
    // (doc-id parity is perfectly source-correlated in this data —
    // every source would land wholly on one side), token-count
    // distributions binned 20×10 — the production drift gate a corpus
    // refresh runs before the mix retrains on a silently-changed
    // source.
    "q_psi_drift" -> { (s, dir) =>
      DataOps.psiDrift(Tables(s, dir).documents, "source",
        isNew = substring(md5(col("doc_id").cast("string")), 1, 1) >= "8",
        value = size(split(col("text"), " ")),
        binWidth = 10L, nBins = 20)
    },

    // SCD Type-2 merge: open history + the snapshot-diff plants →
    // closed/opened validity intervals at t=1000.
    "q_scd2" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val hist = o.select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
      val snap = o.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderstatus"))
        .unionByName(o.filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus")))
      DataOps.scd2Merge(hist, snap, "o_orderkey",
        Seq("o_totalprice", "o_orderstatus"), t = 1000L)
    },

    // Equi-depth histogram: percentile boundaries + map-side bucket
    // assignment — no ntile, no global sort.
    "q_equidepth" -> { (s, dir) =>
      DataOps.equiDepthHistogram(Tables(s, dir).orders, "o_totalprice", nBuckets = 10)
    },

    // Session path mining: 10-min-gap sessions → ordered event-type
    // path strings → top-20 by frequency.
    "q_session_paths" -> { (s, dir) =>
      TimeSeries.sessionPaths(Tables(s, dir).events, "user_id", "ts", "event_id",
        "event_type", gapMs = 600000L, k = 20)
    },

    // Equi-width histogram with fixed bounds (no min/max pre-pass).
    "q_histogram" -> { (s, dir) =>
      DataOps.histogram(Tables(s, dir).orders, "o_totalprice", lo = 0.0, step = 25000.0, nBuckets = 24)
    },

    // Shuffle-key skew diagnostic: top-10 heaviest join keys + share.
    "q_skew_profile" -> { (s, dir) =>
      DataOps.keySkew(Tables(s, dir).lineitem, "l_orderkey", 10)
    },

    // Fixed-grid resampling with forward fill (LOCF) at 1-hour slots:
    // per-user grid over the user's own active span, gaps carry the
    // last observed mean. Epoch-arithmetic slots, so DuckDB reproduces
    // the grid and the IGNORE NULLS window exactly.
    "q_resample_ffill" -> { (s, dir) =>
      TimeSeries.resampleFfill(Tables(s, dir).events, "user_id", "ts", "value", 3600L)
    },

    // Cohort retention: users bucketed by first-activity week (epoch
    // weeks), distinct-active counts per (cohort, age).
    "q_cohort_retention" -> { (s, dir) =>
      TimeSeries.cohortRetention(Tables(s, dir).events, "user_id", "ts", 604800L)
    },

    // Median/MAD robust outlier gate on order totals per priority
    // (k=1.5 so the uniform-ish price range exercises both branches) —
    // the comparison runs on 2dp-rounded operands so the interpolated
    // medians (1-ulp engine differences) can't flip the boolean.
    "q_robust_outliers" -> { (s, dir) =>
      DataOps.robustOutliers(Tables(s, dir).orders,
        "o_orderpriority", "o_orderkey", "o_totalprice", k = 1.5)
    },

    // Trailing 1-hour RANGE window per user: frame membership decided
    // by the ORDER BY value (floor-epoch-seconds), so simultaneous
    // events land in or out together — deterministic without a
    // tiebreak, which no ROWS frame gives under duplicate timestamps.
    "q_range_window" -> { (s, dir) =>
      TimeSeries.trailingRangeStats(Tables(s, dir).events,
        "user_id", "ts", "event_id", "value", windowSec = 3600L)
    },

    // Closed-form per-user EWMA (α = 1/2 → exact power-of-two
    // weights); (ts, event_id) is the total order.
    "q_ewma" -> { (s, dir) =>
      TimeSeries.ewmaLast(Tables(s, dir).events, "user_id",
        Seq(col("ts"), col("event_id")), "value", alpha = 0.5)
    },

    // Inter-arrival gap statistics per event type: lag window on the
    // (user, type) clustering, then a types-sized aggregation — the
    // arrival-process profile a capacity plan reads.
    "q_interarrival" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
      Tables(s, dir).events
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("event_type"),
          ((unix_millis(col("ts")) - unix_millis(col("__prev"))) / 1000.0).as("gap_s"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(avg(col("gap_s")), 2).as("avg_gap_s"),
          round(max(col("gap_s")), 2).as("max_gap_s"))
    },

    // Theil–Sen robust trend per event type: median of all pairwise
    // slopes of the daily-count series — the drift estimator one bad
    // harvest day can't drag, unlike an OLS fit. Pair blow-up is
    // days-per-type², never corpus-sized.
    "q_theilsen" -> { (s, dir) =>
      val daily = Tables(s, dir).events
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2026-01-01").cast("date")).as("x"))
        .agg(count(lit(1)).as("y"))
      TimeSeries.theilSenSlope(daily, "event_type", "x", "y")
    },

    // Winsorized mean per group: clamp at [p05, p95] (boundaries
    // rounded on both sides so interpolation ulps can't move a clamp)
    // — the robust center the plain mean isn't under heavy tails.
    "q_winsorized" -> { (s, dir) =>
      val v = col("o_totalprice").cast("double")
      val b = Tables(s, dir).orders.groupBy("o_orderpriority")
        .agg(round(expr("percentile(o_totalprice, 0.05)"), 6).as("lo"),
          round(expr("percentile(o_totalprice, 0.95)"), 6).as("hi"))
      Tables(s, dir).orders
        .join(broadcast(b), "o_orderpriority")
        .select(col("o_orderpriority"),
          least(greatest(v, col("lo")), col("hi")).as("wv"),
          v.as("v"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(avg(col("v")), 2).as("mean"),
          round(avg(col("wv")), 2).as("winsorized_mean"))
    },

    // Market-basket pairs: top-25 co-ordered part pairs by support.
    "q_item_pairs" -> { (s, dir) =>
      DataOps.frequentPairs(Tables(s, dir).lineitem, "l_orderkey", "l_partkey", k = 25)
    },

    // Rolling 4-row mean/min/max of event values per user.
    "q_rolling" -> { (s, dir) =>
      TimeSeries.rollingStats(Tables(s, dir).events, "user_id", "ts", "event_id",
        "value", n = 4)
    },

    // Ordered view→click→purchase funnel: first-touch semantics, one
    // user-keyed exchange, windowed conditional mins — no joins.
    "q_funnel" -> { (s, dir) =>
      TimeSeries.funnel(Tables(s, dir).events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
    },

    // Time-CONSTRAINED funnel: each stage must land within an hour of
    // the previous one — the gap-bounded form of q_funnel.
    "q_funnel_windowed" -> { (s, dir) =>
      TimeSeries.funnelWindowed(Tables(s, dir).events, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), maxGapSeconds = 3600L)
    },

    // First-order Markov transition matrix over per-user event
    // sequences; (ts, event_id) is the total order.
    "q_transitions" -> { (s, dir) =>
      TimeSeries.transitionMatrix(Tables(s, dir).events, "user_id",
        Seq(col("ts"), col("event_id")), "event_type")
    },

    // Entropy rate of the user-journey Markov chain (Shannon 1948):
    // H = -Σ (c_ij/N)·log2(c_ij/c_i·) over the exact transition
    // counts, with the log2(k) ceiling and the efficiency ratio —
    // how predictable is the next step of a session.
    "q_entropy_rate" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables(s, dir).events
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .groupBy(col("__prev").as("f"), col("event_type").as("t"))
        .agg(count(lit(1)).as("c"))
      val fromTot = pairs.groupBy("f").agg(sum("c").as("cf"))
      val tot = pairs.agg(sum("c").as("nn"), countDistinct("f").as("k"))
      pairs.join(fromTot, "f").crossJoin(broadcast(tot))
        .select(col("nn"), col("k"),
          (col("c").cast("double") / col("nn").cast("double") *
            log2(col("c").cast("double") / col("cf").cast("double"))).as("term"))
        .groupBy("nn", "k")
        .agg((-sum(col("term"))).as("h"))
        .select(col("nn").as("n_transitions"), col("k").as("n_states"),
          round(col("h"), 4).as("entropy_rate_bits"),
          round(log2(col("k").cast("double")), 4).as("max_bits"),
          round(col("h") / log2(col("k").cast("double")), 4).as("efficiency"))
    },

    // Triangle count of the word co-occurrence graph — counts are
    // label-invariant, so the query runs on xxhash64 ids while the
    // oracle enumerates the same unordered word-pair edge set.
    "q_triangles" -> { (s, dir) =>
      val pairs = TextRank.adjacentPairRows(Tables(s, dir).documents, "text")
        .select(xxhash64(col("w1")).as("src"), xxhash64(col("w2")).as("dst"))
      Graph.triangleCount(pairs, "src", "dst")
    },

    // #79c k-truss edge peel on the same word graph: the edges inside
    // at-least-(k−2)-triangle cohesion after 3 fixed rounds, with
    // their final support — community cores minus the hub spokes
    // k-core keeps.
    "q_ktruss" -> { (s, dir) =>
      val pairs = TextRank.adjacentPairRows(Tables(s, dir).documents, "text")
      Graph.kTruss(pairs, "w1", "w2", k = kTrussK, rounds = kTrussRounds)
    },

    // As-of join: each purchase matched to the user's latest earlier
    // error event. Union + running-last window: one shuffle per side.
    "q_asof_join" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val purchases = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
      val errors = e.filter(col("event_type") === "error").select("user_id", "ts")
      AsOf.joinLatest(purchases, errors, key = "user_id", leftTs = "ts", rightTs = "ts", rightCols = Seq("ts"))
        .select(
          col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("p_ms"),
          unix_millis(col("asof_ts")).as("err_ms")
        )
    },

    // ROLLUP hierarchy totals (priority, status) with grand total.
    "q_rollup" -> { (s, dir) =>
      Tables(s, dir).orders
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("revenue"))
    },

    // Pivot status -> columns (missing combos are NULL both sides).
    "q_pivot" -> { (s, dir) =>
      Tables(s, dir).orders
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
    },

    // Exact interpolated percentiles per group.
    "q_percentiles" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75")
        )
    },

    // Set operations: urgent-order customers ∩ F-status customers,
    // minus big-balance customers.
    "q_setops" -> { (s, dir) =>
      val t = Tables(s, dir)
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      val fstat = t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val rich = t.customer.filter(col("c_acctbal") > 9000).select(col("c_custkey").as("o_custkey"))
      urgent.intersect(fstat).except(rich)
    },

    // Range (non-equi) join against a broadcast bucket dimension.
    "q_range_join" -> { (s, dir) =>
      val s2 = s
      import s2.implicits._
      val buckets = Seq((0, 10), (10, 20), (20, 30), (30, 40), (40, 51)).toDF("lo", "hi")
      Tables(s, dir).lineitem
        .join(broadcast(buckets), col("l_quantity") > col("lo") && col("l_quantity") <= col("hi"))
        .groupBy("lo", "hi")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
    },

    // Salted equi-join (skew path) must equal the plain join.
    "q_salted_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      Salt.saltedEquiJoin(
        t.lineitem.select("l_partkey", "l_quantity"),
        t.part.select(col("p_partkey").as("l_partkey"), col("p_size")),
        "l_partkey",
        n = 8
      ).groupBy("p_size")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
    },

    // Custom physical operator: TopKPerKey (partial bounded heaps ->
    // key shuffle of survivors only -> exact final pass). Same oracle
    // as the window formulation.
    "q_topk_native" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      TopK.perKey(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        Seq("c_nationkey"),
        struct(-col("c_acctbal"), col("c_custkey")),
        k = 3
      )
    },

    // CUBE over two dims (all grouping-set combinations).
    "q_cube" -> { (s, dir) =>
      Tables(s, dir).orders
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
    },

    // Window analytics: lag / lead / running + moving aggregates.
    "q_window_analytics" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      Tables(s, dir).orders.select(
        col("o_custkey"),
        col("o_orderkey"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
        round(avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 4).as("moving_avg3")
      )
    },

    // Edit distance (fuzzy author/title matching building block).
    "q_edit_distance" -> { (s, dir) =>
      val n = Tables(s, dir).nation
      n.as("a").join(n.as("b"), col("a.n_nationkey") < col("b.n_nationkey"))
        .select(
          col("a.n_name").as("name_a"),
          col("b.n_name").as("name_b"),
          levenshtein(col("a.n_name"), col("b.n_name")).as("dist")
        )
        .filter(col("dist") <= 5)
    },

    // Sketch-based stats: approx distinct + approx quantiles next to
    // exact values (rows-only: sketch algorithms differ per engine,
    // but the spec asserts the approximations bracket the exact ones).
    // Mergeable-sketch rolling distinct: per-source HLL sketches union
    // into one corpus estimate WITHOUT rescanning the sources — the
    // 100 TB rolling-window pattern (persist per-day sketches;
    // re-aggregation cost is sketch-sized, not data-sized). Estimates
    // are engine-specific → rows-only; the spec bounds error vs exact.
    "q_hll_union" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      d.groupBy("source").agg(expr("hll_sketch_agg(doc_id)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("approx_docs"))
        .crossJoin(d.agg(countDistinct(col("doc_id")).as("exact_docs")))
    },

    "q_approx_stats" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
      // exact distinct in its own aggregation: mixing countDistinct
      // with other aggs forces an Expand that doubles the scan rows
      val sketches = li.agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        round(expr("approx_percentile(l_quantity, 0.5, 1000)"), 2).as("approx_median")
      )
      val exact = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
      sketches.crossJoin(exact)
    },

    // Interval (stream-stream-capable) join: errors within 30 minutes
    // before each purchase, per user.
    "q_interval_join" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val purchases = e.filter(col("event_type") === "purchase")
      val errors = e.filter(col("event_type") === "error")
      graft.streaming.EventStreams.intervalJoin(purchases, errors, "user_id", "30 MINUTES", "1 hour")
        .select(
          col("l_event_id"), col("user_id"),
          unix_millis(col("l_ts")).as("l_ms"),
          col("r_event_id"),
          unix_millis(col("r_ts")).as("r_ms")
        )
    },

    // IVF ANN: k-means coarse quantizer + inverted-list probe
    // (rows-only; recall vs brute force checked in spec).
    "q_ann_ivf" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ivf.topK(e.filter(col("id") % 20 === 0 && col("id") < 20000), e, k = 3, nlist = 8, nprobe = 5)
        .select(col("probe_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"))
    },

    // IVF recall gate, machine-checked per round: per-probe IVF hits
    // are intersected with the IN-SPARK brute-force top-k (itself
    // oracle-proven exact by q_ann_bruteforce), and the query emits
    // the probe count plus whether aggregate recall clears the
    // documented 0.6 floor. The oracle re-derives n_probes from the
    // data and pins recall_floor_met TRUE — a recall regression flips
    // the boolean and fails the hash compare. Measured recall at
    // nprobe=5 (tools.RecallCheck): 0.83 sf0.01 / 0.83 sf0.1 /
    // 0.87 sf1 — a ≥0.2 margin over the gate, so one unlucky
    // centroid draw cannot flip the round red.
    //
    // Probes are CAPPED to a fixed id range: the gate's ground truth
    // is an exact probes × corpus scan, so an uncapped probe set (any
    // fixed modulus of a growing corpus) makes the GATE quadratic in
    // corpus size even though the operator it checks is not — the sf3
    // ladder measured exactly that (5.6x at 3x data). A fixed probe
    // sample keeps recall estimation linear at any scale; 250-1000
    // probes bound the estimate's error tighter than the 0.2 margin.
    "q_ann_ivf_recall" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val probes = e.filter(col("id") % 20 === 0 && col("id") < 20000)
      val ivf = Ivf.topK(probes, e, k = 3, nlist = 8, nprobe = 5)
        .select("probe_id", "neighbor_id")
      val bf = VectorOps.bruteForceTopK(probes, e, 3).select("probe_id", "neighbor_id")
      val hits = bf.join(ivf, Seq("probe_id", "neighbor_id"), "left_semi")
        .groupBy("probe_id").agg(count(lit(1)).as("n_hit"))
      bf.groupBy("probe_id").agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("probe_id"), "left")
        .agg(
          count(lit(1)).as("n_probes"),
          (sum(coalesce(col("n_hit"), lit(0L))).cast("double") / sum(col("n_exact")) >= 0.6)
            .as("recall_floor_met"))
    },

    // Embedding-cosine near-dup: planted scaled copies (same direction)
    // must collide in sign buckets and score cosine ~1 (rows-only).
    "q_dedup_embedding" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val variants = e.filter(col("id") % 10 === 0)
        .select((col("id") + 1000000).as("id"), transform(col("vec"), x => x * 1.5f).as("vec"))
      VectorOps.nearDupPairs(e.unionByName(variants), threshold = 0.99, planes = 8, dim = 64)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
    },

    // The PRODUCTION shape of the same near-dup: planes scaled with
    // the corpus count (planesFor ≈ log2(n/16)) so in-bucket candidate
    // pairs stay ~linear in n instead of the fixed-planes ~n²/256 —
    // the config a 100× scale-up actually runs. Still oracle-exact:
    // hyperplanes are prefix-stable, so the oracle inlines 16 planes
    // and masks to the same count(*)-derived planes (integer rule on
    // both sides — no floating log2). The corpus.count() here is a
    // real one-scan pre-pass (the union-with-transform defeats the
    // parquet-metadata count shortcut), priced in deliberately: the
    // oracle's planes derive from count(*) of the SAME union, so the
    // two sides must count the same relation. A production planner
    // would read the corpus row count from catalog stats instead of
    // scanning — the planes choice needs only an order of magnitude.
    "q_dedup_embedding_scaled" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val variants = e.filter(col("id") % 10 === 0)
        .select((col("id") + 1000000).as("id"), transform(col("vec"), x => x * 1.5f).as("vec"))
      val corpus = e.unionByName(variants)
      val planes = VectorOps.planesFor(corpus.count())
      VectorOps.nearDupPairs(corpus, threshold = 0.99, planes = planes, dim = 64)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_rank_global" ->
      """SELECT c_custkey,
        |  CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |FROM customer""".stripMargin,
    "q_running_total" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
        |    (ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |FROM orders""".stripMargin,
    "q_global_lag" ->
      """WITH x AS (SELECT event_id, ts, lag(ts) OVER (ORDER BY ts, event_id) AS prev
        |           FROM events)
        |SELECT event_id, (epoch_ms(ts) - epoch_ms(prev)) / 1000.0 AS gap_s
        |FROM x WHERE prev IS NOT NULL""".stripMargin,
    // Unrolled programmatically from the SAME (iters, damping) the
    // query passes — oracle and query cannot drift.
    "q_pagerank" -> Graph.pageRankSqlDuck(pagerankEdgeCteDuck, iters = 3, damping = 0.85),
    "q_kcore" ->
      (Graph.kCoreSqlDuck(kcoreEdgeCteDuck, k = kCoreK, rounds = kCoreRounds) + "\nORDER BY id"),
    "q_ktruss" ->
      Graph.kTrussSqlDuck(ktrussEdgeCteDuck, k = kTrussK, rounds = kTrussRounds),
    // Same fixed binning, Laplace smoothing, and 4-dp rounding; ln is
    // the only transcendental and sits inside the rounded sum.
    "q_psi_drift" ->
      """WITH d AS (SELECT source AS g, substr(md5(doc_id::VARCHAR), 1, 1) >= '8' AS nw,
        |             least(greatest(CAST(floor(len(string_split(text, ' '))::DOUBLE / 10) AS BIGINT), 0), 19) AS bin
        |           FROM documents),
        |c AS (SELECT g, nw, bin, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2, 3),
        |t AS (SELECT g, nw, sum(c) AS t FROM c GROUP BY 1, 2),
        |grid AS (SELECT gg.g, b.range AS bin, s.nw
        |         FROM (SELECT DISTINCT g FROM d) gg
        |         CROSS JOIN range(0, 20) b
        |         CROSS JOIN (VALUES (false), (true)) s(nw)),
        |p AS (SELECT grid.g, grid.nw, grid.bin,
        |        (COALESCE(c.c, 0) + 0.5) / (t.t + 10.0) AS p, t.t
        |      FROM grid LEFT JOIN c USING (g, nw, bin) JOIN t USING (g, nw)),
        |o AS (SELECT g, bin, p AS po, t AS n_old FROM p WHERE NOT nw),
        |n AS (SELECT g, bin, p AS pn, t AS n_new FROM p WHERE nw)
        |SELECT o.g AS source, CAST(max(o.n_old) AS BIGINT) AS n_old,
        |       CAST(max(n.n_new) AS BIGINT) AS n_new,
        |       round(sum((n.pn - o.po) * ln(n.pn / o.po)), 4) + 0.0 AS psi
        |FROM o JOIN n USING (g, bin) GROUP BY o.g""".stripMargin,
    "q_snapshot_diff" ->
      """WITH n AS (
        |  SELECT o_orderkey AS key,
        |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS price,
        |         o_orderstatus AS status FROM orders WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS key, o_totalprice AS price, o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |o AS (SELECT o_orderkey AS key, o_totalprice AS price, o_orderstatus AS status FROM orders)
        |SELECT COALESCE(o.key, n.key) AS key,
        |       CASE WHEN o.key IS NULL THEN 'added'
        |            WHEN n.key IS NULL THEN 'removed'
        |            WHEN o.price IS DISTINCT FROM n.price
        |              OR o.status IS DISTINCT FROM n.status THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON n.key = o.key""".stripMargin,
    "q_histogram" ->
      """WITH b AS (SELECT least(greatest(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 0), 23) AS bucket,
        |             o_totalprice AS v FROM orders)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |       round(min(v), 4) AS v_min, round(max(v), 4) AS v_max, round(avg(v), 4) AS v_avg
        |FROM b GROUP BY bucket""".stripMargin,
    "q_skew_profile" ->
      """WITH c AS (SELECT l_orderkey AS key, count(*) AS cnt FROM lineitem GROUP BY l_orderkey),
        |t AS (SELECT count(*) AS total FROM lineitem)
        |SELECT key, cnt, round(cnt * 1.0 / total, 6) AS share
        |FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 10""".stripMargin,
    // Epoch-arithmetic slots; DuckDB's range() excludes the upper
    // bound, hence s1 + step, and its IGNORE NULLS window matches
    // Spark's last(_, ignoreNulls = true).
    "q_resample_ffill" ->
      """WITH e AS (SELECT user_id AS key, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS slot,
        |             value AS v FROM events),
        |sa AS (SELECT key, slot, avg(v) AS v_obs FROM e GROUP BY key, slot),
        |sp AS (SELECT key, min(slot) AS s0, max(slot) AS s1 FROM e GROUP BY key),
        |g AS (SELECT key, unnest(range(s0, s1 + 3600, 3600)) AS slot FROM sp),
        |j AS (SELECT g.key, g.slot, sa.v_obs FROM g LEFT JOIN sa ON sa.key = g.key AND sa.slot = g.slot)
        |SELECT key, slot, round(v_obs, 4) AS v_obs,
        |       round(last_value(v_obs IGNORE NULLS) OVER (
        |         PARTITION BY key ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_filled,
        |       v_obs IS NULL AS is_gap
        |FROM j""".stripMargin,
    "q_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS key,
        |             CAST(floor(epoch(ts)/604800)*604800 AS BIGINT) AS bucket FROM events),
        |c AS (SELECT key, min(bucket) AS cohort FROM a GROUP BY key)
        |SELECT c.cohort, CAST((a.bucket - c.cohort) / 604800 AS BIGINT) AS age,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM a JOIN c USING (key) GROUP BY 1, 2""".stripMargin,
    "q_interarrival" ->
      """WITH x AS (SELECT event_type, ts,
        |        lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev
        |      FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |       round(avg((epoch_ms(ts) - epoch_ms(prev)) / 1000.0), 2) AS avg_gap_s,
        |       round(max((epoch_ms(ts) - epoch_ms(prev)) / 1000.0), 2) AS max_gap_s
        |FROM x WHERE prev IS NOT NULL GROUP BY event_type""".stripMargin,
    // Same daily binning, pairwise-slope set, and interpolated median
    // (quantile_cont ≡ Spark's percentile) rounded 6 dp.
    "q_theilsen" ->
      """WITH daily AS (SELECT event_type,
        |        date_diff('day', DATE '2026-01-01', CAST(ts AS DATE)) AS x,
        |        count(*) AS y
        |      FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |        (CAST(b.y AS DOUBLE) - a.y) / (CAST(b.x AS DOUBLE) - a.x) AS slope
        |      FROM daily a JOIN daily b ON b.event_type = a.event_type AND a.x < b.x)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |       round(quantile_cont(slope, 0.5), 6) AS slope_med
        |FROM p GROUP BY event_type""".stripMargin,
    "q_winsorized" ->
      """WITH b AS (SELECT o_orderpriority,
        |             round(quantile_cont(o_totalprice, 0.05), 6) AS lo,
        |             round(quantile_cont(o_totalprice, 0.95), 6) AS hi
        |           FROM orders GROUP BY o_orderpriority)
        |SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       round(avg(CAST(o.o_totalprice AS DOUBLE)), 2) AS mean,
        |       round(avg(least(greatest(CAST(o.o_totalprice AS DOUBLE), b.lo), b.hi)), 2)
        |         AS winsorized_mean
        |FROM orders o JOIN b USING (o_orderpriority)
        |GROUP BY o.o_orderpriority""".stripMargin,
    "q_item_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |p AS (SELECT x.i AS item_a, y.i AS item_b, CAST(count(*) AS BIGINT) AS n
        |      FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i GROUP BY 1, 2),
        |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM bi)
        |SELECT item_a, item_b, n, round(n / CAST(nb.n_baskets AS DOUBLE), 6) AS support
        |FROM p, nb ORDER BY n DESC, item_a, item_b LIMIT 25""".stripMargin,
    "q_range_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS win_cnt,
        |  round(sum(CAST(value AS DOUBLE)) OVER w, 2) + 0.0 AS win_sum
        |FROM (SELECT event_id, user_id, value,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_rolling" ->
      """SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
        |  round(avg(value) OVER w, 4) AS roll_avg,
        |  min(CAST(value AS DOUBLE)) OVER w AS roll_min,
        |  max(CAST(value AS DOUBLE)) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,
    // Same plants as q_snapshot_diff; the two output arms mirror the
    // query's close/open classification exactly.
    "q_scd2" ->
      """WITH o AS (SELECT o_orderkey AS key, o_totalprice, o_orderstatus FROM orders),
        |snap AS (SELECT key,
        |           CASE WHEN key % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |           o_orderstatus
        |         FROM o WHERE key % 13 <> 0
        |         UNION ALL
        |         SELECT key + 10000000, o_totalprice, o_orderstatus FROM o WHERE key % 11 = 0),
        |j AS (SELECT coalesce(o.key, s.key) AS key,
        |        o.key IS NOT NULL AS in_old, s.key IS NOT NULL AS in_new,
        |        o.o_totalprice AS op, o.o_orderstatus AS os,
        |        s.o_totalprice AS np, s.o_orderstatus AS ns_,
        |        (o.o_totalprice IS DISTINCT FROM s.o_totalprice) OR
        |        (o.o_orderstatus IS DISTINCT FROM s.o_orderstatus) AS chg
        |      FROM o FULL OUTER JOIN snap s ON s.key = o.key)
        |SELECT key, CAST(0 AS BIGINT) AS valid_from,
        |       CAST(CASE WHEN in_new AND NOT chg THEN NULL ELSE 1000 END AS BIGINT) AS valid_to,
        |       op AS o_totalprice, os AS o_orderstatus
        |FROM j WHERE in_old
        |UNION ALL
        |SELECT key, CAST(1000 AS BIGINT), CAST(NULL AS BIGINT), np, ns_
        |FROM j WHERE in_new AND (NOT in_old OR chg)""".stripMargin,
    // quantile_cont ≡ Spark's interpolated percentile; boundaries are
    // rounded on both sides before the comparison.
    "q_equidepth" -> {
      val fracs = (1 until 10).map(i => i / 10.0).mkString(", ")
      s"""WITH bs AS (SELECT list_transform(quantile_cont(o_totalprice, [$fracs]),
         |              b -> round(b, 6)) AS bs FROM orders)
         |SELECT CAST(len(list_filter(bs.bs, b -> b < round(v, 6))) AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n,
         |       round(min(v), 4) AS v_min, round(max(v), 4) AS v_max
         |FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders) t, bs
         |GROUP BY 1""".stripMargin
    },
    // The q_sessionize gap construction with the event_id tiebreak,
    // then an ordered string_agg per session.
    "q_session_paths" ->
      """WITH x AS (SELECT user_id, ts, event_id, event_type,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
        |y AS (SELECT *, CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) > 600000
        |                THEN 1 ELSE 0 END AS ns FROM x),
        |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS sid FROM y),
        |p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |      FROM z GROUP BY user_id, sid),
        |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY path)
        |SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q_funnel_windowed" ->
      """WITH b AS (SELECT user_id AS k, ts, event_type AS ty FROM events),
        |s0 AS (SELECT *, min(CASE WHEN ty = 'view' THEN ts END) OVER (PARTITION BY k) AS t0 FROM b),
        |s1 AS (SELECT *, min(CASE WHEN ty = 'click' AND ts >= t0
        |                        AND ts <= t0 + INTERVAL 3600 SECOND THEN ts END)
        |                   OVER (PARTITION BY k) AS t1 FROM s0),
        |s2 AS (SELECT *, min(CASE WHEN ty = 'purchase' AND ts >= t1
        |                        AND ts <= t1 + INTERVAL 3600 SECOND THEN ts END)
        |                   OVER (PARTITION BY k) AS t2 FROM s1),
        |pk AS (SELECT k, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2 FROM s2 GROUP BY k)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(count(t0) AS BIGINT) AS n_view,
        |       CAST(count(t1) AS BIGINT) AS n_click,
        |       CAST(count(t2) AS BIGINT) AS n_purchase,
        |       round(count(t0) / CAST(count(*) AS DOUBLE), 4) AS rate_view,
        |       round(count(t1) / CAST(count(*) AS DOUBLE), 4) AS rate_click,
        |       round(count(t2) / CAST(count(*) AS DOUBLE), 4) AS rate_purchase
        |FROM pk""".stripMargin,
    // Same stage-windowed construction; ts comparisons stay inside
    // one engine so the nanos-vs-micros representation cancels.
    "q_funnel" ->
      """WITH b AS (SELECT user_id AS k, ts, event_type AS ty FROM events),
        |s0 AS (SELECT *, min(CASE WHEN ty = 'view' THEN ts END) OVER (PARTITION BY k) AS t0 FROM b),
        |s1 AS (SELECT *, min(CASE WHEN ty = 'click' AND ts >= t0 THEN ts END)
        |                   OVER (PARTITION BY k) AS t1 FROM s0),
        |s2 AS (SELECT *, min(CASE WHEN ty = 'purchase' AND ts >= t1 THEN ts END)
        |                   OVER (PARTITION BY k) AS t2 FROM s1),
        |pk AS (SELECT k, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2 FROM s2 GROUP BY k)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(count(t0) AS BIGINT) AS n_view,
        |       CAST(count(t1) AS BIGINT) AS n_click,
        |       CAST(count(t2) AS BIGINT) AS n_purchase,
        |       round(count(t0) / CAST(count(*) AS DOUBLE), 4) AS rate_view,
        |       round(count(t1) / CAST(count(*) AS DOUBLE), 4) AS rate_click,
        |       round(count(t2) / CAST(count(*) AS DOUBLE), 4) AS rate_purchase
        |FROM pk""".stripMargin,
    "q_transitions" ->
      """WITH p AS (SELECT user_id, event_type AS to_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |      FROM events),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM p
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS nf FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, round(c.n / CAST(t.nf AS DOUBLE), 4) AS p
        |FROM c JOIN t USING (from_type)""".stripMargin,
    "q_entropy_rate" ->
      """WITH p AS (SELECT user_id, event_type AS t,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f
        |      FROM events),
        |c AS (SELECT f, t, CAST(count(*) AS BIGINT) AS c FROM p
        |      WHERE f IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM c GROUP BY f),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS nn, CAST(count(DISTINCT f) AS BIGINT) AS k FROM c),
        |s AS (SELECT nn, k,
        |        -sum(CAST(c.c AS DOUBLE) / CAST(nn AS DOUBLE) *
        |             log2(CAST(c.c AS DOUBLE) / CAST(ft.cf AS DOUBLE))) AS h
        |      FROM c JOIN ft USING (f) CROSS JOIN tt GROUP BY nn, k)
        |SELECT nn AS n_transitions, k AS n_states,
        |  round(h, 4) AS entropy_rate_bits,
        |  round(log2(CAST(k AS DOUBLE)), 4) AS max_bits,
        |  round(h / log2(CAST(k AS DOUBLE)), 4) AS efficiency
        |FROM s""".stripMargin,
    // Triangle/vertex/edge counts are invariant to the vertex
    // labeling, so the oracle enumerates on the words themselves.
    "q_triangles" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |p0 AS (SELECT unnest(list_transform(range(1, len(ws)),
        |         i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS u FROM w WHERE len(ws) >= 2),
        |e AS (SELECT DISTINCT least(u.w1, u.w2) AS a, greatest(u.w1, u.w2) AS b
        |      FROM p0 WHERE u.w1 <> u.w2),
        |wed AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c FROM e e1 JOIN e e2 ON e2.a = e1.b),
        |tri AS (SELECT count(*) AS n_triangles FROM wed JOIN e e3 ON e3.a = wed.a AND e3.b = wed.c),
        |v AS (SELECT count(DISTINCT x) AS n_vertices FROM
        |        (SELECT a AS x FROM e UNION ALL SELECT b FROM e) t),
        |ec AS (SELECT count(*) AS n_edges FROM e)
        |SELECT CAST(v.n_vertices AS BIGINT) AS n_vertices, CAST(ec.n_edges AS BIGINT) AS n_edges,
        |       CAST(tri.n_triangles AS BIGINT) AS n_triangles
        |FROM tri, v, ec""".stripMargin,
    // quantile_cont ≡ Spark's interpolated percentile; the outlier
    // comparison mirrors the query's 2dp-rounded operands.
    "q_robust_outliers" ->
      """WITH v AS (SELECT o_orderpriority AS grp, o_orderkey AS id,
        |             CAST(o_totalprice AS DOUBLE) AS v FROM orders),
        |med AS (SELECT grp, quantile_cont(v, 0.5) AS med FROM v GROUP BY grp),
        |mad AS (SELECT grp, quantile_cont(abs(v.v - med.med), 0.5) AS mad
        |        FROM v JOIN med USING (grp) GROUP BY grp)
        |SELECT v.grp, v.id, v.v, round(med.med, 4) AS med, round(mad.mad, 4) AS mad,
        |       round(abs(v.v - med.med), 2) > round(1.5 * mad.mad, 2) AS is_outlier
        |FROM v JOIN med USING (grp) JOIN mad USING (grp)""".stripMargin,
    // Same closed-form weights: position from the identical
    // (ts, event_id) order; pow(0.5, k) is an exact power of two in
    // both engines, so only the final sum's addition order differs —
    // absorbed by the rounding.
    "q_ewma" ->
      """WITH x AS (SELECT user_id, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |        count(*) OVER (PARTITION BY user_id) AS n
        |      FROM events)
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_obs,
        |  round(sum(CASE WHEN rn = 1 THEN value * pow(0.5, n - 1)
        |            ELSE value * 0.5 * pow(0.5, n - rn) END), 4) AS ewma
        |FROM x GROUP BY user_id""".stripMargin,
    "q_fellegi_sunter" -> {
      val surnames = linkSurnameList.map(s => s"'$s'").mkString("[", ", ", "]")
      def m(f: String) = s"(a_m_$f + 0.5) / (n_m + 1.0)"
      def u(f: String) = s"(a_u_$f + 0.5) / (n_u + 1.0)"
      def term(flag: String, f: String) =
        s"(CASE WHEN $flag THEN log2((${m(f)}) / (${u(f)})) " +
          s"ELSE log2((1.0 - ${m(f)}) / (1.0 - ${u(f)})) END)"
      s"""WITH nm AS (SELECT c_custkey,
         |        translate(reverse(CAST(c_custkey AS VARCHAR)), '0123456789', 'BCDLMRFGST') ||
         |        list_extract($surnames, CAST(c_custkey % 12 AS INT) + 1) AS name
         |      FROM customer),
         |un AS (SELECT c_custkey AS id, name FROM nm
         |      UNION ALL
         |      SELECT c_custkey + 1000000,
         |        CASE WHEN c_custkey % 5 = 0 THEN reverse(name) ELSE name || 'e' END FROM nm),
         |o AS (SELECT id, name,
         |        lag(id, 1) OVER w AS id1, lag(name, 1) OVER w AS nm1,
         |        lag(id, 2) OVER w AS id2, lag(name, 2) OVER w AS nm2
         |      FROM un WINDOW w AS (ORDER BY name, id)),
         |p AS (SELECT id1 AS id_a, nm1 AS name_a, id AS id_b, name AS name_b
         |      FROM o WHERE id1 IS NOT NULL
         |      UNION ALL
         |      SELECT id2, nm2, id, name FROM o WHERE id2 IS NOT NULL),
         |f AS (SELECT id_a, id_b,
         |        regexp_extract(name_a, '[a-z]+$$') = regexp_extract(name_b, '[a-z]+$$') AS ag_surname,
         |        substr(name_a, 1, 3) = substr(name_b, 1, 3) AS ag_prefix,
         |        length(name_a) = length(name_b) AS ag_len,
         |        abs(id_a - id_b) = 1000000 AS is_match
         |      FROM p),
         |s AS (SELECT
         |  CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_m,
         |  CAST(sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_u,
         |  CAST(sum(CASE WHEN is_match AND ag_surname THEN 1 ELSE 0 END) AS BIGINT) AS a_m_surname,
         |  CAST(sum(CASE WHEN NOT is_match AND ag_surname THEN 1 ELSE 0 END) AS BIGINT) AS a_u_surname,
         |  CAST(sum(CASE WHEN is_match AND ag_prefix THEN 1 ELSE 0 END) AS BIGINT) AS a_m_prefix,
         |  CAST(sum(CASE WHEN NOT is_match AND ag_prefix THEN 1 ELSE 0 END) AS BIGINT) AS a_u_prefix,
         |  CAST(sum(CASE WHEN is_match AND ag_len THEN 1 ELSE 0 END) AS BIGINT) AS a_m_len,
         |  CAST(sum(CASE WHEN NOT is_match AND ag_len THEN 1 ELSE 0 END) AS BIGINT) AS a_u_len
         |FROM f)
         |SELECT id_a, id_b, ag_surname, ag_prefix, ag_len, is_match,
         |  round(${term("ag_surname", "surname")} + ${term("ag_prefix", "prefix")}
         |        + ${term("ag_len", "len")}, 4) + 0.0 AS fs_weight
         |FROM f, s""".stripMargin
    },

    "q_sorted_neighborhood" -> {
      val surnames = linkSurnameList.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH nm AS (SELECT c_custkey,
         |        translate(reverse(CAST(c_custkey AS VARCHAR)), '0123456789', 'BCDLMRFGST') ||
         |        list_extract($surnames, CAST(c_custkey % 12 AS INT) + 1) AS name
         |      FROM customer),
         |u AS (SELECT c_custkey AS id, name FROM nm
         |      UNION ALL
         |      SELECT c_custkey + 1000000,
         |        CASE WHEN c_custkey % 5 = 0 THEN reverse(name) ELSE name || 'e' END FROM nm),
         |o AS (SELECT id, name,
         |        lag(id, 1) OVER w AS id1, lag(name, 1) OVER w AS nm1,
         |        lag(id, 2) OVER w AS id2, lag(name, 2) OVER w AS nm2
         |      FROM u WINDOW w AS (ORDER BY name, id)),
         |p AS (SELECT id1 AS id_a, nm1 AS name_a, id AS id_b, name AS name_b
         |      FROM o WHERE id1 IS NOT NULL
         |      UNION ALL
         |      SELECT id2, nm2, id, name FROM o WHERE id2 IS NOT NULL)
         |SELECT id_a, id_b, name_a, name_b,
         |       round(jaro_winkler_similarity(name_a, name_b), 6) + 0.0 AS jw
         |FROM p WHERE round(jaro_winkler_similarity(name_a, name_b), 6) >= 0.9""".stripMargin
    },

    // Soundex chain rendered by the same step list the query uses
    // (Phonetic.soundexSqlDuck); levenshtein is built into both engines.
    "q_record_linkage" -> {
      val surnames = linkSurnameList.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH nm AS (SELECT c_custkey, c_custkey % 9973 AS cohort, c_custkey % 12 AS sidx,
         |        translate(reverse(CAST(c_custkey AS VARCHAR)), '0123456789', 'BCDLMRFGST') ||
         |        list_extract($surnames, CAST(c_custkey % 12 AS INT) + 1) AS name
         |      FROM customer),
         |l AS (SELECT c_custkey AS id_a, name AS name_a, cohort,
         |        ${graft.functions.Phonetic.soundexSqlDuck("name")} AS blk FROM nm),
         |r0 AS (SELECT c_custkey, cohort,
         |         CASE WHEN c_custkey % 5 = 0 THEN reverse(name) ELSE name || 'e' END AS name_b
         |       FROM nm),
         |r AS (SELECT c_custkey + 1000000 AS id_b, name_b, cohort,
         |        ${graft.functions.Phonetic.soundexSqlDuck("name_b")} AS blk FROM r0)
         |SELECT id_a, id_b, name_a, name_b,
         |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
         |FROM l JOIN r USING (blk, cohort)
         |WHERE levenshtein(name_a, name_b) <= 2""".stripMargin
    },
    "q_damerau_linkage" -> {
      val surnames = linkSurnameList.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH n0 AS (SELECT c_custkey AS ck,
         |        translate(reverse(CAST(c_custkey AS VARCHAR)), '0123456789', 'BCDLMRFGST') ||
         |        list_extract($surnames, CAST(c_custkey % 12 AS INT) + 1) AS nm
         |      FROM customer),
         |l AS (SELECT ck AS id_a, nm AS name_a,
         |        least(substr(nm, 1, 1), substr(nm, 2, 1)) ||
         |        greatest(substr(nm, 1, 1), substr(nm, 2, 1)) ||
         |        regexp_extract(substr(nm, 3), '^[A-Z]*') AS blk
         |      FROM n0),
         |r0 AS (SELECT ck,
         |        CASE WHEN ck % 5 = 0 THEN substr(nm, 2, 1) || substr(nm, 1, 1) || substr(nm, 3)
         |             ELSE nm || 'e' END AS name_b
         |      FROM n0),
         |r AS (SELECT ck + 1000000 AS id_b, name_b,
         |        least(substr(name_b, 1, 1), substr(name_b, 2, 1)) ||
         |        greatest(substr(name_b, 1, 1), substr(name_b, 2, 1)) ||
         |        regexp_extract(substr(name_b, 3), '^[A-Z]*') AS blk
         |      FROM r0)
         |SELECT id_a, id_b,
         |       CAST(levenshtein(name_a, name_b) AS INT) AS lev,
         |       CAST(damerau_levenshtein(name_a, name_b) AS INT) AS dl
         |FROM l JOIN r USING (blk)
         |WHERE damerau_levenshtein(name_a, name_b) <= 2""".stripMargin
    },
    "q_jaro_linkage" -> {
      val surnames = linkSurnameList.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH nm AS (SELECT c_custkey,
         |        translate(reverse(CAST(c_custkey AS VARCHAR)), '0123456789', 'BCDLMRFGST') ||
         |        list_extract($surnames, CAST(c_custkey % 12 AS INT) + 1) AS name
         |      FROM customer),
         |l AS (SELECT c_custkey AS id_a, name AS name_a,
         |        regexp_extract(name, '^[A-Z]+') AS blk FROM nm),
         |r0 AS (SELECT c_custkey,
         |        CASE WHEN c_custkey % 5 = 0 THEN reverse(name) ELSE name || 'e' END AS name_b
         |      FROM nm),
         |r AS (SELECT c_custkey + 1000000 AS id_b, name_b,
         |        regexp_extract(name_b, '^[A-Z]+') AS blk FROM r0
         |      WHERE regexp_extract(name_b, '^[A-Z]+') <> '')
         |SELECT id_a, id_b,
         |       round(jaro_winkler_similarity(name_a, name_b), 6) + 0.0 AS jw
         |FROM l JOIN r USING (blk)
         |WHERE round(jaro_winkler_similarity(name_a, name_b), 6) >= 0.85""".stripMargin
    },
    // n_probes is real data arithmetic; TRUE is the documented recall
    // floor (see q_ann_ivf_recall) — the Spark side computes actual
    // recall against its own exact top-k, so a quality drop fails the
    // compare even though DuckDB cannot run the IVF itself.
    "q_ann_ivf_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_probes, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 20000""".stripMargin,
    // LSH buckets replicated with inlined ±1 hyperplane literals; the
    // float-scaled variants round through REAL so every double matches
    // the Spark floats bit for bit (raw-sim threshold compare is then
    // exact, not approximate).
    "q_dedup_embedding" ->
      s"""WITH e0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |ev AS (SELECT id, v FROM e0
         |       UNION ALL
         |       SELECT id + 1000000 AS id,
         |              list_transform(v, x -> CAST(CAST(x * 1.5 AS REAL) AS DOUBLE)) AS v
         |       FROM e0 WHERE id % 10 = 0),
         |b AS (SELECT id, v, ${VectorOps.bucketSqlDuck("v", 8, 64)} AS bucket,
         |        sqrt(list_dot_product(v, v)) AS nrm FROM ev
         |      WHERE list_dot_product(v, v) > 0)
         |SELECT x.id AS id_a, y.id AS id_b,
         |       round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) + 0.0 AS sim
         |FROM b x JOIN b y ON y.bucket = x.bucket AND x.id < y.id
         |WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.99""".stripMargin,
    // Count-scaled twin: planes = smallest p in [8,16] with 16·2^p ≥ n
    // (VectorOps.planesFor's integer rule verbatim), bucket = the
    // 16-plane bucket masked to the low p bits via the per-plane
    // j < p gates baked into bucketSqlDuckScaled.
    "q_dedup_embedding_scaled" ->
      s"""WITH e0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |ev AS (SELECT id, v FROM e0
         |       UNION ALL
         |       SELECT id + 1000000 AS id,
         |              list_transform(v, x -> CAST(CAST(x * 1.5 AS REAL) AS DOUBLE)) AS v
         |       FROM e0 WHERE id % 10 = 0),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
         |pl AS (SELECT coalesce(min(CASE WHEN (CAST(16 AS BIGINT) << p) >= n THEN p END), 16) AS p
         |       FROM (SELECT CAST(range AS INT) AS p FROM range(8, 17)) CROSS JOIN nn),
         |b AS (SELECT id, v, ${VectorOps.bucketSqlDuckScaled("v", 16, 64, "pl.p")} AS bucket,
         |        sqrt(list_dot_product(v, v)) AS nrm FROM ev CROSS JOIN pl
         |      WHERE list_dot_product(v, v) > 0)
         |SELECT x.id AS id_a, y.id AS id_b,
         |       round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) + 0.0 AS sim
         |FROM b x JOIN b y ON y.bucket = x.bucket AND x.id < y.id
         |WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.99""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS p_ms, epoch_ms(e.ts) AS err_ms
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
        |ON p.user_id = e.user_id AND e.ts <= p.ts""".stripMargin,
    "q_salted_join" ->
      """SELECT p_size, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY p_size""".stripMargin,
    "q_topk_native" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 3""".stripMargin,
    "q_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin,
    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin,
    "q_edit_distance" ->
      """SELECT a.n_name AS name_a, b.n_name AS name_b, levenshtein(a.n_name, b.n_name) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(a.n_name, b.n_name) <= 5""".stripMargin,
    "q_interval_join" ->
      """SELECT p.event_id AS l_event_id, p.user_id, epoch_ms(p.ts) AS l_ms,
        |       e.event_id AS r_event_id, epoch_ms(e.ts) AS r_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND e.ts >= p.ts - INTERVAL '30 minutes' AND e.ts <= p.ts""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  NULLIF(count(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS "F",
        |  NULLIF(count(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS "O",
        |  NULLIF(count(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000""".stripMargin,
    "q_range_join" ->
      """SELECT lo, hi, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |JOIN (VALUES (0, 10), (10, 20), (20, 30), (30, 40), (40, 51)) AS b(lo, hi)
        |  ON l_quantity > lo AND l_quantity <= hi
        |GROUP BY lo, hi""".stripMargin
  )
}
