package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** deflate(text).length / utf8_length — the compression-ratio quality
  * signal LLM pipelines use to catch repetitive/boilerplate documents
  * (low ratio = highly compressible = repeated structure) and binary
  * junk (ratio near or above 1). Complements the n-gram repetition
  * ratio: deflate sees long-range and cross-line repetition that a
  * bigram ratio misses.
  *
  * Native codegen expression; the Deflater is thread-local and reset
  * per value (creating one per row measures allocator throughput, not
  * compression). BEST_SPEED: the signal needs relative ordering, not
  * optimal compression. No oracle (DuckDB has no deflate) — covered by
  * a monotonicity spec.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"CompressionRatio requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CompressionRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CompressionRatio.ratio($c);")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {
  def apply(text: Column): Column =
    GraftExpr.column(CompressionRatio(GraftExpr.expression(text)))

  // One Deflater per task thread, reset per value (a per-row Deflater
  // measures allocator throughput, not compression). Each holds ~256 KB
  // of native zlib state; the Cleaner releases it via end() once its
  // thread dies and is collected, so a bounded executor pool holds a
  // bounded amount and short-lived threads don't leak it for the JVM
  // lifetime.
  private val cleaner = java.lang.ref.Cleaner.create()
  private val local: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = {
      val d = new Deflater(Deflater.BEST_SPEED, true)
      cleaner.register(Thread.currentThread(), new Runnable { def run(): Unit = d.end() })
      d
    }
  }

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}
