package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native engine-portable (md5-hex) MinHash signature: element i is
  *
  *   min over shingles s of substring(md5(saltPrefix ++ s ++ ":" ++ i), 1, 16)
  *
  * — bit-identical to the composed HOF form
  * `transform(sequence(0,H-1), i -> array_min(transform(shingles,
  * s -> substring(md5(concat(salt, s, lit(":"), i.cast("string"))), 1, 16))))`
  * (spec-pinned), which Spark evaluates through interpreted
  * higher-order functions with one UTF8String concat, one full 32-char
  * hex encode, one substring copy and one array materialization per
  * (shingle, i) pair. Here each (shingle, i) pair is one digest into a
  * reused MessageDigest; minima are tracked as the first 8 digest
  * bytes compared unsigned (identical order to comparing the 16-char
  * lowercase-hex strings, since same-length hex is monotone in its
  * bytes) and only the H winners are hex-encoded.
  *
  * Null/empty semantics match the HOF form exactly: the outer
  * `transform` ranges over `sequence(0,H-1)` (never null), so a NULL
  * input array yields H null elements — same as an empty or all-null
  * shingle array (array_min of NULL/empty/all-null is NULL); null
  * shingle elements are skipped. The result itself is never NULL.
  *
  * CodegenFallback like [[NgramShingles]]: the row cost is the md5
  * digests themselves, already a tight Java loop.
  */
case class PortableMinHashSig(child: Expression, numHashes: Int, saltPrefix: String)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  // HOF-equal: transform(sequence(0,H-1), ...) is never NULL, even when
  // the shingle array is (each element is then array_min(NULL) = NULL)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[Any](numHashes)) else nullSafeEval(v)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"PortableMinHashSig requires array<string>, got $other")
  }

  @transient private lazy val saltBytes: Array[Byte] =
    saltPrefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  // ":0", ":1", ... — the constant per-hash suffix bytes
  @transient private lazy val suffixBytes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => (":" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    val seen = new Array[Boolean](numHashes)
    val md = PortableMinHashSig.digests.get()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val sBytes = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          if (saltBytes.length > 0) md.update(saltBytes)
          md.update(sBytes)
          md.update(suffixBytes(i))
          val d = md.digest()
          // first 8 digest bytes, big-endian, compared unsigned ==
          // lexicographic order of the 16-char lowercase-hex prefix
          val v = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          if (!seen(i) || java.lang.Long.compareUnsigned(v, mins(i)) < 0) {
            mins(i) = v
            seen(i) = true
          }
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = if (seen(i)) UTF8String.fromString(PortableMinHashSig.hex16(mins(i))) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSig =
    copy(child = newChild)
}

object PortableMinHashSig {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** 16 lowercase hex chars of a big-endian long (zero-padded). */
  private def hex16(v: Long): String = {
    val cs = new Array[Char](16)
    var k = 0
    while (k < 16) {
      cs(k) = hexDigits(((v >>> ((15 - k) * 4)) & 0xf).toInt)
      k += 1
    }
    new String(cs)
  }

  def apply(shingles: Column, numHashes: Int, saltPrefix: String = ""): Column =
    GraftExpr.column(PortableMinHashSig(GraftExpr.expression(shingles), numHashes, saltPrefix))
}
