package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native chunked portable-MinHash signature: one pass over the shingle
  * array computing, per shingle, its md5 ONCE for the chunk-parity
  * routing (first hex digit < '8' → lo chunk) and its `h` salted md5
  * prefixes ONCE, folded into three running minima — the lo-chunk
  * signature, the hi-chunk signature, and (as their elementwise min,
  * which is exactly what a whole-array pass would produce since the
  * per-shingle hashes are chunk-independent) the full-document
  * signature.
  *
  * Replaces the composed form in q_minhash_merge — two interpreted HOF
  * `filter(sh, s -> substr(md5(s),1,1) …)` lambdas plus three
  * `portableSignature` trees — which md5'd every shingle ~18 times
  * (2 parity + 2×8 chunk + 8 full at h=8) through boxed interpreted
  * lambdas. Here each shingle is digested h+1 times, natively.
  * Semantics are bit-identical: the hex-string min over
  * `substring(md5(s ":" i), 1, 16)` equals the unsigned comparison of
  * the digest's first 8 bytes, tracked as a long and formatted once at
  * the end ("%016x" — lowercase, like Spark's and DuckDB's md5).
  *
  * Returns struct(lo array<string>, hi array<string>, full
  * array<string>); lo/hi are NULL when that chunk is empty (mirroring
  * the `WHERE len(shc) > 0` guard in the oracle CTE). The full field is
  * non-null whenever the input array is non-empty.
  *
  * Scale shape: scalar, codegen-friendly (the generated code calls the
  * static helper, keeping the surrounding WholeStageCodegen span
  * intact); no shuffles introduced — per-doc work only.
  */
case class ChunkedMinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  private val arr = ArrayType(StringType, containsNull = false)

  override def dataType: DataType = StructType(Seq(
    StructField("lo", arr, nullable = true),
    StructField("hi", arr, nullable = true),
    // also nullable: an empty/all-null shingle array yields a struct of
    // three NULL fields (callers filter empty shingle sets first, as
    // with MinHashSig — this just keeps codegen null-safe)
    StructField("full", arr, nullable = true)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ChunkedMinHashSig requires array<string>, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    ChunkedMinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = ChunkedMinHashSig.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c, $numHashes);"
    })

  override protected def withNewChildInternal(newChild: Expression): ChunkedMinHashSig =
    copy(child = newChild)
}

object ChunkedMinHashSig {

  def apply(shingles: Column, numHashes: Int): Column =
    GraftExpr.column(ChunkedMinHashSig(GraftExpr.expression(shingles), numHashes))

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, h: Int): InternalRow = {
    val md = md5Local.get()
    val suffixes = Array.tabulate(h)(i => (":" + i).getBytes("UTF-8"))
    val minLo = Array.fill(h)(-1L) // unsigned max = 0xffff… sentinel
    val minHi = Array.fill(h)(-1L)
    var hasLo = false
    var hasHi = false
    var sawAny = false
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        sawAny = true
        val sBytes = arr.getUTF8String(j).getBytes
        // parity digest: md5(s) first hex digit < '8' ⇔ top bit of the
        // first byte is 0
        md.reset()
        val parity = md.digest(sBytes)
        val isLo = (parity(0) & 0x80) == 0
        if (isLo) hasLo = true else hasHi = true
        val mins = if (isLo) minLo else minHi
        var i = 0
        while (i < h) {
          md.reset()
          md.update(sBytes)
          md.update(suffixes(i))
          val d = md.digest()
          // first 16 hex chars == first 8 digest bytes, big-endian
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
          if (java.lang.Long.compareUnsigned(v, mins(i)) < 0) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!sawAny) return new GenericInternalRow(Array[Any](null, null, null))
    def hex(vs: Array[Long]): GenericArrayData =
      new GenericArrayData(vs.map(v => UTF8String.fromString(f"$v%016x")): Array[Any])
    val full = Array.tabulate(h) { i =>
      if (!hasLo) minHi(i)
      else if (!hasHi) minLo(i)
      else if (java.lang.Long.compareUnsigned(minLo(i), minHi(i)) <= 0) minLo(i)
      else minHi(i)
    }
    new GenericInternalRow(Array[Any](
      if (hasLo) hex(minLo) else null,
      if (hasHi) hex(minHi) else null,
      hex(full)))
  }
}
