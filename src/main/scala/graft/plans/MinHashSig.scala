package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: `numHashes` seeded-xxhash64 minima over a
  * shingle array, in one codegen'd loop.
  *
  * Replaces the composed form
  * `transform(sequence(0,H-1), i -> array_min(transform(shingles, s -> xxhash64(s, i))))`
  * which Spark evaluates through interpreted higher-order functions —
  * measured 96 s for q_dedup_minhash at sf0.1 vs ~3 s with this
  * expression. Semantics are identical: element i equals
  * min over shingles of hashLong(i, hashUTF8String(shingle, 42)),
  * exactly what XxHash64(shingle, i) computes.
  *
  * Empty/all-null shingle arrays yield Long.MaxValue entries (callers
  * filter empty shingle sets first).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSig requires array<string>, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val base = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < numHashes) {
          // hashInt, not hashLong: the HOF form seeds with an int lambda
          // variable from sequence(0, H-1)
          val h = XXH64.hashInt(i, base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $base = $xxh.hashUTF8String($c.getUTF8String($j), 42L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $h = $xxh.hashInt($i, $base);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(shingles: Column, numHashes: Int): Column =
    GraftExpr.column(MinHashSig(GraftExpr.expression(shingles), numHashes))
}
