package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftExpr}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._

/** A fully relational Bloom filter: the bitmap is ONE row holding an
  * array of 63-bit words, built by a single aggregation; membership is
  * a pure per-row expression over the broadcast bitmap.
  *
  * Why not a driver-built sketch (`df.stat.bloomFilter`): that
  * collects every key to the driver's merge path and probes through a
  * Scala function, off the codegen path. Here both ends stay
  * declarative: the build shuffles only (word, bits) pairs — at most
  * `mBits/63` rows regardless of key count, with map-side bit_or
  * combine — and the probe is column algebra against one broadcast
  * row.
  *
  * The 100 TB decontamination shape this exists for: a benchmark
  * n-gram set too big to broadcast as raw strings (hundreds of MB)
  * compresses to an `mBits/8`-byte bitmap (~10 bits per key at 1%
  * FPR, a 50×+ reduction) that IS broadcastable; the corpus then
  * prefilters map-side and only the tiny survivor set pays the exact
  * verify join. No false negatives by construction, so exactness is
  * preserved end-to-end.
  *
  * 63-bit words, not 64: the top bit is never used, so every word
  * stays non-negative and `1 << bit` never overflows on engines whose
  * BIGINT shift throws at 63 (DuckDB) — the structure is reproducible
  * outside the JVM. Hashing is xxhash64(key, seed): deterministic
  * under task retries and AQE re-planning, no RNG.
  */
object Bloom {
  private val WordBits = 63

  private def shl(v: Column, amt: Column): Column =
    GraftExpr.column(ShiftLeft(GraftExpr.expression(v), GraftExpr.expression(amt.cast("int"))))
  private def shr(v: Column, amt: Column): Column =
    GraftExpr.column(ShiftRight(GraftExpr.expression(v), GraftExpr.expression(amt.cast("int"))))

  /** Number of bitmap words for an mBits-bit filter. */
  def numWords(mBits: Int): Int = (mBits + WordBits - 1) / WordBits

  /** The k hashed bit positions of `key`, each in [0, mBits). */
  def positions(key: Column, k: Int, mBits: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      pmod(xxhash64(key, i), lit(mBits.toLong)))

  /** Build the bitmap: one row, `numWords(mBits)` longs, dense (words
    * nothing hashed into are 0, so probe lookups never miss). One
    * explode of k positions per key, one word-keyed bit_or, one
    * bounded collect_list of at most mBits/63 structs.
    */
  def build(keys: DataFrame, keyCol: String, k: Int, mBits: Int): DataFrame = {
    val words = keys.sparkSession.range(numWords(mBits).toLong)
      .select(col("id").as("word"))
    val setBits = keys
      .select(explode(positions(col(keyCol), k, mBits)).as("pos"))
      .select((col("pos") / WordBits).cast("long").as("word"),
        (col("pos") % WordBits).as("bit"))
      .groupBy("word")
      .agg(bit_or(shl(lit(1L), col("bit"))).as("bits"))
    words.join(setBits, Seq("word"), "left")
      .select(col("word"), coalesce(col("bits"), lit(0L)).as("bits"))
      .agg(transform(array_sort(collect_list(struct(col("word"), col("bits")))),
        s => s.getField("bits")).as("bitmap"))
  }

  /** True iff every hashed bit of `key` is set in `bitmap` (the
    * build's single-row array, attached via crossJoin(broadcast(_))).
    */
  def mightContain(key: Column, bitmap: Column, k: Int, mBits: Int): Column =
    forall(positions(key, k, mBits), p =>
      shr(element_at(bitmap, (p / WordBits).cast("int") + 1), p % WordBits)
        .bitwiseAND(lit(1L)) === 1L)
}
