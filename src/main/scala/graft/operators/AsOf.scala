package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * right.ts <= left.ts within the same key.
  *
  * Spark-first formulation: tag both sides, union, one shuffle by key
  * with a partition-local sort, and a running `last(ignoreNulls)`
  * window — right rows sort before left rows at equal timestamps, so
  * the match is inclusive. Unlike join-then-argmax this never builds
  * the |left|x|right| intermediate, and unlike a point-interval
  * BroadcastNestedLoop it scales to both sides large: cost is
  * O((|L|+|R|) log) per key partition, one exchange each side.
  */
object AsOf {

  /** left/right must share `key`; result = left columns + `rightCols`
    * (each prefixed `asof_`), NULL when no right row precedes.
    */
  def joinLatest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]
  ): DataFrame = {
    val rStruct = struct(rightCols.map(right(_)): _*)
    val r = right.select(
      right(key).as("__k"),
      right(rightTs).as("__ts"),
      lit(0).as("__side"),
      rStruct.as("__r"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__l")
    )
    val lStruct = struct(left.columns.map(left(_)): _*)
    val l = left.select(
      left(key).as("__k"),
      left(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(r.schema("__r").dataType).as("__r"),
      lStruct.as("__l")
    )
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = r.unionByName(l)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftOut = left.columns.map(c => col("__l").getField(c).as(c))
    val rightOut = rightCols.map(c => col("__match").getField(c).as(s"asof_$c"))
    merged.select(leftOut ++ rightOut: _*)
  }
}
