package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash bit-vote vector over a token array: each
  * token hashes once (xxhash64(token) = hashUTF8String(token, 42)),
  * then votes ±1 into all 64 bit counters — one pass, one codegen'd
  * loop. The composed form duplicated the token-hash transform into
  * each of the 64 bit expressions (tokens re-split and re-hashed 64x,
  * measured 12 s at sf0.1 vs <1 s native). Bit-identical to
  * TextDedup.simhashBitsHof (spec-enforced).
  */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"SimHashBits requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(votes.map(v => if (v > 0) 1L else 0L).toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val votes = ctx.freshName("votes")
      val bits = ctx.freshName("bits")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |long[] $votes = new long[64];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = $xxh.hashUTF8String($c.getUTF8String($j), 42L);
         |    for (int $i = 0; $i < 64; $i++) {
         |      $votes[$i] += ((($h >>> $i) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long[] $bits = new long[64];
         |for (int $i = 0; $i < 64; $i++) { $bits[$i] = $votes[$i] > 0 ? 1L : 0L; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(tokens: Column): Column =
    GraftExpr.column(SimHashBits(GraftExpr.expression(tokens)))
}
