package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** American Soundex (census variant) as a pure column chain — the
  * classic blocking key for record linkage: names that sound alike
  * share a key, so fuzzy matching runs inside blocks instead of
  * all-pairs.
  *
  * The chain is engine-portable by construction and rendered twice
  * from the same step list (Column algebra here, DuckDB SQL in
  * [[soundexSqlDuck]]), so blocked joins are oracle-checkable:
  *   1. uppercase, strip non-letters; empty → ""
  *   2. remove H/W (transparent: same-coded letters around them
  *      collapse, per the census rule)
  *   3. translate letters to digit codes, vowels+Y to the separator 0
  *   4. collapse runs of the same digit
  *   5. drop the leading code if it is the first letter's own code
  *      (vowel-initial names drop their leading 0 harmlessly;
  *      H/W-initial names translate to "H"/"W", which never matches
  *      a digit, so nothing drops — one uniform rule, no branches)
  *   6. strip separators, prepend the first letter, right-pad with
  *      zeros to 4
  */
object Phonetic {

  private val From = "AEIOUYBFPVCGJKQSXZDTLMNR"
  private val To = "000000111122222222334556"

  def soundex(name: Column): Column = {
    val u = regexp_replace(upper(name), "[^A-Z]", "")
    val first = substring(u, 1, 1)
    val d = translate(regexp_replace(u, "[HW]", ""), From, To)
    // run-collapse per digit, not via a backreference — RE2 engines
    // (the oracle side) have no backreferences, and per-digit replaces
    // are equivalent for same-digit runs
    val dd = (0 to 6).foldLeft(d)((c, i) => regexp_replace(c, s"$i$i+", s"$i"))
    val dropped = when(substring(dd, 1, 1) === translate(first, From, To),
      substring(dd, 2, 1000)).otherwise(dd)
    val digits = regexp_replace(dropped, "0", "")
    when(length(u) === 0, lit(""))
      .otherwise(substring(concat(first, digits, lit("000")), 1, 4))
  }

  /** The identical chain over a DuckDB expression `e`. */
  def soundexSqlDuck(e: String): String = {
    val u = s"regexp_replace(upper($e), '[^A-Z]', '', 'g')"
    val d = s"translate(regexp_replace($u, '[HW]', '', 'g'), '$From', '$To')"
    val dd = (0 to 6).foldLeft(d)((c, i) => s"regexp_replace($c, '$i$i+', '$i', 'g')")
    val dropped = s"CASE WHEN substr($dd, 1, 1) = translate(substr($u, 1, 1), '$From', '$To') " +
      s"THEN substr($dd, 2) ELSE $dd END"
    val digits = s"replace($dropped, '0', '')"
    s"CASE WHEN length($u) = 0 THEN '' " +
      s"ELSE substr(substr($u, 1, 1) || $digits || '000', 1, 4) END"
  }
}
