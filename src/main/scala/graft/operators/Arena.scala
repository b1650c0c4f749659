package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-comparison evaluation — the arena/reward-model side of an
  * LLM data pipeline: contenders meet on shared trials, outcomes fold
  * into a win matrix, and latent strengths come from the
  * Bradley-Terry model (Bradley & Terry 1952) fit by Hunter's (2004)
  * MM iteration — the machinery behind chatbot-arena ladders and
  * RLHF preference aggregation.
  *
  * Scale shape: the only data-sized work is building per-trial scores
  * (one hash aggregation over the events). Trials self-join only
  * within a trial key, so candidate volume is Σ_trial T², with T =
  * contender count — a model roster, not the corpus. The win matrix
  * (≤ T² rows) is roster-bounded; the MM iterations run as joins on
  * that bounded frame, never touching the corpus again.
  */
object Arena {

  /** Head-to-head win matrix from per-(contender, trial) integer
    * scores: for every unordered pair meeting on a trial, who scored
    * higher. Output per (a < b): meetings, wins, ties, and a's win
    * rate over decided meetings (4dp, NULL when all tied).
    */
  def winMatrix(scores: DataFrame): DataFrame = {
    val x = scores.select(col("m").as("a"), col("trial"), col("s").as("sa"))
    val y = scores.select(col("m").as("b"), col("trial"), col("s").as("sb"))
    x.join(y, Seq("trial")).filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n"),
        sum((col("sa") > col("sb")).cast("long")).as("wins_a"),
        sum((col("sa") < col("sb")).cast("long")).as("wins_b"),
        sum((col("sa") === col("sb")).cast("long")).as("ties"))
      .withColumn("win_rate_a",
        when(col("wins_a") + col("wins_b") > 0,
          round(col("wins_a").cast("double") /
            (col("wins_a") + col("wins_b")).cast("double"), 4)))
  }

  /** Bradley-Terry strengths from a win matrix via `iters` rounds of
    * Hunter's MM update p_i ← W_i / Σ_j n_ij/(p_i+p_j), renormalized
    * each round to mean 1 (the model is scale-free). Ties are dropped
    * (decided games only, the classical BT likelihood); contenders
    * with no decided games are excluded. All-double arithmetic with
    * one 4dp round at the very end — the iteration count is fixed, so
    * both engines run the identical float recursion.
    *
    * Everything after [[winMatrix]] is roster-bounded; the loop is a
    * fixed unroll of broadcast-sized joins (same posture as the BPE
    * merge induction: bounded driver-free rounds).
    */
  def bradleyTerry(matrix: DataFrame, iters: Int): DataFrame = {
    val sym = matrix
      .select(col("a").as("i"), col("b").as("j"), col("wins_a").as("w"),
        (col("wins_a") + col("wins_b")).as("ng"))
      .unionByName(matrix.select(col("b").as("i"), col("a").as("j"),
        col("wins_b").as("w"), (col("wins_a") + col("wins_b")).as("ng")))
      .filter(col("ng") > 0)
      .localCheckpoint(true)
    val wins = sym.groupBy("i")
      .agg(sum(col("w")).cast("double").as("wi"), sum(col("ng")).as("games"))
    var p = wins.select(col("i"), lit(1.0).as("p"))
    for (_ <- 1 to iters) {
      val denom = sym
        .join(p.select(col("i"), col("p").as("pi")), Seq("i"))
        .join(p.select(col("i").as("j"), col("p").as("pj")), Seq("j"))
        .groupBy("i")
        .agg(sum(col("ng").cast("double") / (col("pi") + col("pj"))).as("den"))
      val raw = wins.join(denom, Seq("i"))
        .select(col("i"), (col("wi") / col("den")).as("praw"))
      val scale = raw.agg((count(lit(1)).cast("double") / sum(col("praw"))).as("k"))
      p = raw.crossJoin(broadcast(scale))
        .select(col("i"), (col("praw") * col("k")).as("p"))
        .localCheckpoint(true)
    }
    wins.join(p, Seq("i"))
      .select(col("i").as("m"), col("games"), col("wi").cast("long").as("wins"),
        round(col("p"), 4).as("strength"))
  }
}
