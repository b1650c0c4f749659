package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-vs-candidate text scoring — the eval side of a training
  * pipeline: BLEU for generation quality against references
  * (Papineni et al. 2002) and token-level WER (the ASR/agent-trace
  * word error rate) for transcript fidelity. Both are (id, ref, cand)
  * pair operators: the pair table is the user's alignment (here the
  * planted near-dup corpus), the scoring is fully distributed.
  */
object TextEval {

  /** Position n-grams WITH duplicates (unlike TextAnalysis.wordNgrams,
    * which is a distinct shingle set) — BLEU's clipped counts need the
    * multiset. `arr` is an already-tokenized array column, so the
    * lambda touches only element_at (no per-element re-split).
    */
  private def grams(arr: Column, n: Int): Column =
    when(size(arr) >= n,
      transform(sequence(lit(1), size(arr) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(arr, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** BLEU-2 per (id, reference, candidate) pair: modified n-gram
    * precisions p₁,p₂ with per-gram clipping (matched = Σ_g
    * min(count_cand g, count_ref g)), brevity penalty
    * min(1, e^(1−r/c)), score = BP·√(p₁p₂); 0 when either precision
    * is 0 (log undefined — the standard convention).
    *
    * Shape: text shuffles once per order as (pair, gram, count) rows —
    * clipping is an equi-join on (pair, gram) between two aggregations
    * that share the key, so the join is co-partitioned with no extra
    * exchange; everything after is id-keyed. Candidate gram totals come
    * from the length row (c−n+1), not a second scan. The only doubles
    * are the final closed form over exact longs (two-term log fold,
    * fixed order), rounded 4dp per the repo discipline.
    */
  def bleuPairs(pairs: DataFrame, idCol: String, refCol: String, candCol: String): DataFrame = {
    val base = pairs.select(col(idCol).as("id"),
      graft.functions.TextAnalysis.tokenize(col(refCol)).as("rw"),
      graft.functions.TextAnalysis.tokenize(col(candCol)).as("cw"))
      .filter(size(col("rw")) > 0 && size(col("cw")) > 0)
      .localCheckpoint(true)
    val lens = base.select(col("id"), size(col("rw")).cast("long").as("n_ref"),
      size(col("cw")).cast("long").as("n_cand"))
    def matched(n: Int): DataFrame = {
      val rc = base.select(col("id"), explode(grams(col("rw"), n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("rc"))
      val cc = base.select(col("id"), explode(grams(col("cw"), n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("cc"))
      cc.join(rc, Seq("id", "g"))
        .groupBy("id").agg(sum(least(col("cc"), col("rc"))).as(s"m$n"))
    }
    val m = lens
      .join(matched(1), Seq("id"), "left")
      .join(matched(2), Seq("id"), "left")
      .select(col("id"), col("n_ref"), col("n_cand"),
        coalesce(col("m1"), lit(0L)).as("m1"), coalesce(col("m2"), lit(0L)).as("m2"))
    val p1 = col("m1").cast("double") / col("n_cand").cast("double")
    val p2 = col("m2").cast("double") / (col("n_cand") - 1).cast("double")
    val bp = when(col("n_cand") >= col("n_ref"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("n_ref").cast("double") / col("n_cand").cast("double")))
    val bleu = when(col("m1") === 0 || col("m2") === 0 || col("n_cand") < 2, lit(0.0))
      .otherwise(bp * exp((log(p1) + log(p2)) / lit(2.0)))
    m.select(col("id"), col("n_ref"), col("n_cand"), col("m1"), col("m2"),
      round(bleu, 4).as("bleu"))
  }

  /** Token-level word error rate per (id, reference, candidate) pair
    * over the first `maxTokens` tokens of each side: Levenshtein
    * distance over TOKEN sequences, computed by mapping each PAIR's
    * distinct tokens to single printable-ASCII chars and running the
    * native char-level `levenshtein` on the encoded strings — token
    * edit distance without a UDF or a per-pair DP loop, on both
    * engines. Single-byte chars are load-bearing: DuckDB's
    * `levenshtein` counts BYTES, so any multi-byte alphabet breaks
    * engine parity (measured 3× on a CJK alphabet).
    *
    * The dictionary is PER PAIR (rank over the pair's own sorted
    * token set), so the alphabet bound is structural — 2·maxTokens ≤
    * 93 printable slots by construction, independent of corpus
    * vocabulary (a global dictionary died at the sf1 ladder rung when
    * the scaled corpus crossed 93 distinct tokens). Prefix truncation
    * is the declared semantic (WER@k, the bounded-cost eval gate);
    * rank-over-sorted-set makes the encoding a pure function of the
    * pair, deterministic and retry-stable.
    *
    * Shape: pair-partitioned windows and id-keyed joins only —
    * nothing global, everything AQE-splittable; encoding shuffles
    * (id, pos, token) rows once per side and reassembles via the
    * sort_array fold.
    */
  def werPairs(pairs: DataFrame, idCol: String, refCol: String, candCol: String,
               maxTokens: Int = 40): DataFrame = {
    require(2 * maxTokens <= 93,
      s"werPairs: 2*maxTokens must fit the 93-slot ASCII alphabet, got $maxTokens")
    def tok(c: Column) = slice(graft.functions.TextAnalysis.tokenize(c), 1, maxTokens)
    val base = pairs.select(col(idCol).as("id"),
      tok(col(refCol)).as("rw"), tok(col(candCol)).as("cw"))
      .filter(size(col("rw")) > 0)
      .localCheckpoint(true)
    val dict = base.select(col("id"), explode(col("rw")).as("w"))
      .union(base.select(col("id"), explode(col("cw")).as("w")))
      .distinct()
      .withColumn("r", row_number().over(Window.partitionBy("id").orderBy("w")).cast("long"))
      .withColumn("ch",
        decode(unhex(lpad(hex(col("r") + lit(33L)), 4, "0")), "UTF-16BE"))
    def encoded(tokens: Column, as: String): DataFrame =
      base.select(col("id"), posexplode(tokens).as(Seq("pos", "w")))
        .join(dict.select("id", "w", "ch"), Seq("id", "w"))
        .groupBy("id")
        .agg(aggregate(sort_array(collect_list(struct(col("pos"), col("ch")))),
          lit(""), (a, x) => concat(a, x.getField("ch"))).as(as))
    val lens = base.select(col("id"), size(col("rw")).cast("long").as("n_ref"),
      size(col("cw")).cast("long").as("n_cand"))
    lens.join(encoded(col("rw"), "rs"), Seq("id"))
      .join(encoded(col("cw"), "cs"), Seq("id"), "left")
      .select(col("id"), col("n_ref"), col("n_cand"),
        levenshtein(coalesce(col("cs"), lit("")), col("rs")).cast("long").as("token_edits"))
      .withColumn("wer_ppm", expr("token_edits * 1000000 div n_ref"))
  }
}
