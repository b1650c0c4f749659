package graft.functions

import scala.collection.immutable.TreeSet

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (Dataset `Aggregator`): sorted-distinct
  * pipe-joined string — `utils.piped(sorted(set(...)))` as a UDAF,
  * registerable for SQL use via `functions.udaf`:
  *
  *   spark.udf.register("piped_set", functions.udaf(PipedSetAgg))
  *   SELECT piped_set(x) FROM t GROUP BY k
  *
  * The buffer is a TreeSet so merges are associative/commutative and
  * the partial (map-side) aggregation contract holds — equivalent to
  * array_join(array_sort(collect_set(x)), '|') but usable where a
  * single aggregate expression is required.
  */
object PipedSetAgg extends Aggregator[String, TreeSet[String], String] {
  override def zero: TreeSet[String] = TreeSet.empty[String]
  override def reduce(b: TreeSet[String], a: String): TreeSet[String] =
    if (a == null) b else b + a
  override def merge(b1: TreeSet[String], b2: TreeSet[String]): TreeSet[String] = b1 ++ b2
  override def finish(r: TreeSet[String]): String = r.mkString("|")
  override def bufferEncoder: Encoder[TreeSet[String]] =
    Encoders.kryo[TreeSet[String]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
