package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Phonetic

/** Record linkage (entity resolution): match two name sets without the
  * all-pairs cross join — the author/organization matching problem the
  * reference solves row-at-a-time against Postgres lookups
  * (rialto_airflow/harvest_incremental/contributions.py's
  * name-to-author association), re-expressed as a blocked fuzzy join.
  */
object Linkage {

  /** Blocked fuzzy join: candidates must share a Soundex block, then
    * verify with Levenshtein ≤ maxDist. Output: one row per verified
    * pair (id_a, id_b, name_a, name_b, dist).
    *
    * Scale shape: each side shuffles (block, id, name) once for the
    * equi-join on the block key — never a cross join (the no-cartesian
    * sweep in PlanAuditSpec covers this query). Edit distance runs
    * only on in-block pairs. Common-name blocks are the skewed case:
    * levenshtein is per-joined-row work, so AQE's skew-join split
    * carries the cost split with it; for adversarial skew, append a
    * salt digit to the block key on both sides of a same-set self-join.
    *
    * The known blocking trade (as in every census-style linkage):
    * a typo in the FIRST letter changes the block and the pair is
    * missed — recall is bounded by the blocking key, exactness only
    * inside blocks.
    *
    * `extraBlockCols` (same-named on both sides) AND-compose exact
    * attributes into the block key — Soundex alone has at most
    * 26·7³ ≈ 9k distinct keys, so occupancy (and the in-block
    * quadratic term) grows linearly with ANY corpus; real linkage
    * always compounds the phonetic key with an exact field (birth
    * year, zip) to keep block population bounded. Without one, this
    * operator is super-linear on large inputs by construction.
    */
  def blockedFuzzyJoin(
      a: DataFrame, b: DataFrame,
      idA: String, nameA: String,
      idB: String, nameB: String,
      maxDist: Int,
      extraBlockCols: Seq[String] = Nil
  ): DataFrame = {
    val left = a.select(Seq(col(idA).as("id_a"), col(nameA).as("name_a"),
      Phonetic.soundex(col(nameA)).as("__blk")) ++ extraBlockCols.map(col): _*)
    val right = b.select(Seq(col(idB).as("id_b"), col(nameB).as("name_b"),
      Phonetic.soundex(col(nameB)).as("__blk")) ++ extraBlockCols.map(col): _*)
    left.join(right, "__blk" +: extraBlockCols)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Sorted-neighborhood linkage (Hernández & Stolfo 1995): sort all
    * records by the key, compare each record only to its `window`−1
    * predecessors, keep pairs scoring ≥ `minJw` Jaro-Winkler — the
    * third blocking family next to phonetic blocks
    * ([[blockedFuzzyJoin]]) and LSH: candidate volume is EXACTLY
    * n·(window−1), the tightest bound of the three, at the cost of
    * missing pairs whose keys sort far apart (e.g. reversed names —
    * the documented weakness that pairs it WITH, not instead of, the
    * other blockers in a production pass).
    *
    * Shape: NO global window. [[GlobalRank]] assigns the global sort
    * position via the two-pass range-partitioned rank; rows then hash
    * into fixed-size rank blocks (8192), each block's first window−1
    * rows are ALSO copied to the previous block as ghost rows, and the
    * lag() taps run inside bounded per-block windows — every pair
    * (rn−k, rn) is produced exactly once (from the block that owns the
    * PREDECESSOR's rank), so the candidate set is identical to the
    * global-window formulation while no task ever sorts more than
    * block + window rows. Scoring is the native codegen Jaro-Winkler
    * on the windowed pairs only.
    */
  def sortedNeighborhood(records: DataFrame, idCol: String, keyCol: String,
                         window: Int, minJw: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blockSize = 8192L
    val base = records.select(col(idCol).as("id"), col(keyCol).as("key"))
    val ranked = GlobalRank.rowNumbers(base, Nil, Seq(col("key"), col("id")), "__rn").df
      .withColumn("__blk", expr(s"(__rn - 1) div $blockSize"))
    // ghost copies: a block's first window-1 rows re-appear at the end
    // of the previous block so cross-boundary lags resolve there
    val ghosts = ranked
      .filter(col("__blk") > 0 && expr(s"(__rn - 1) % $blockSize") < lit(window - 1))
      .withColumn("__blk", col("__blk") - 1)
    val w = Window.partitionBy("__blk").orderBy("__rn")
    val tapped = ranked.unionByName(ghosts).select(Seq(col("id"), col("key"),
      col("__rn"), col("__blk")) ++
      (1 until window).map(k =>
        struct(lag(col("id"), k).over(w).as("id"), lag(col("key"), k).over(w).as("key"))
          .as(s"p$k")): _*)
    val pairs = tapped.select(col("id"), col("key"), col("__rn"), col("__blk"),
      posexplode(array((1 until window).map(k => col(s"p$k")): _*)).as(Seq("pos", "p")))
      .filter(col("p.id").isNotNull)
      // the pair (rn-k, rn) belongs to the block that owns rank rn-k:
      // emitted there and only there (kills ghost-ghost duplicates)
      .filter(expr(s"(__rn - pos - 2) div $blockSize") === col("__blk"))
    pairs.select(
      col("p.id").as("id_a"), col("id").as("id_b"),
      col("p.key").as("name_a"), col("key").as("name_b"),
      round(graft.plans.JaroWinkler(col("p.key"), col("key")), 6).as("jw"))
      .filter(col("jw") >= minJw)
  }

  /** Fellegi-Sunter probabilistic match scoring (Fellegi & Sunter
    * 1969): from labeled candidate pairs with K boolean agreement
    * fields, estimate per-field m = P(agree|match) and
    * u = P(agree|non-match) (+0.5/+1 Laplace smoothing so no log
    * diverges), then score every pair with the log₂ likelihood ratio
    * Σ_k agree? log₂(m/u) : log₂((1−m)/(1−u)) — the classical
    * probabilistic-linkage decision weight on top of whatever blocking
    * produced the candidates.
    *
    * Shape: ONE aggregation over the pair table produces the 2K+2
    * sufficient statistics as a single row broadcast back; the score
    * is a fixed K-term expression (field-list order, engine-exact
    * after 4-dp rounding). Nothing shuffles except the pair table
    * itself, once.
    */
  def fellegiSunter(pairs: DataFrame, isMatch: Column,
                    agreeCols: Seq[String]): DataFrame = {
    val p = pairs.withColumn("__m", isMatch)
    val statCols = Seq(
      sum(when(col("__m"), 1L).otherwise(0L)).as("n_m"),
      sum(when(!col("__m"), 1L).otherwise(0L)).as("n_u")) ++
      agreeCols.flatMap { c =>
        Seq(sum(when(col("__m") && col(c), 1L).otherwise(0L)).as(s"a_m_$c"),
          sum(when(!col("__m") && col(c), 1L).otherwise(0L)).as(s"a_u_$c"))
      }
    val stats = p.agg(statCols.head, statCols.tail: _*)
    def rate(a: String, n: String) =
      (col(a).cast("double") + 0.5) / (col(n).cast("double") + 1.0)
    val weight = agreeCols.map { c =>
      val m = rate(s"a_m_$c", "n_m")
      val u = rate(s"a_u_$c", "n_u")
      when(col(c), log2(m / u)).otherwise(log2((lit(1.0) - m) / (lit(1.0) - u)))
    }.reduce(_ + _)
    p.crossJoin(broadcast(stats))
      .withColumn("fs_weight", round(weight, 4))
      .select((Seq("id_a", "id_b").map(col) ++ agreeCols.map(col) :+
        col("__m").as("is_match") :+ col("fs_weight")): _*)
  }
}
