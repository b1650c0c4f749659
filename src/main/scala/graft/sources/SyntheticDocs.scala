package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic documents source — the source-API rung of
  * the extension ladder (expressions → optimizer rules → physical
  * operators → now a connector): a table the engine GENERATES instead
  * of reads, with real filter pushdown and column pruning, usable for
  * load testing and plan experiments at any scale without storage.
  *
  *   spark.read.format("graft.sources.SyntheticDocs")
  *     .option("rows", 1000000).option("partitions", 32).load()
  *
  * Schema: (doc_id long, source string, n_chars long, text string);
  * every value is a pure function of doc_id, so any slice is
  * reproducible and an oracle can recompute it.
  *
  * Scale contract (what a REAL connector must also do):
  *   - `pruneColumns`: the reader materializes ONLY the requested
  *     fields — `select(count(doc_id))` never pays for text
  *     generation, exactly as a parquet scan never decodes unread
  *     column chunks.
  *   - `pushFilters`: doc_id range predicates narrow the generated id
  *     interval BEFORE partition planning, so partitions that fall
  *     entirely outside the bounds are never created — the moral
  *     equivalent of partition pruning + row-group skipping. The
  *     range predicates are CONSUMED (interval intersection applies a
  *     conjunction of =/</<=/>/>= on doc_id exactly, so Spark need
  *     not re-evaluate them); any other filter is retained for the
  *     engine to re-apply. Consuming them is also what clears the
  *     post-scan-filter path so aggregate pushdown can engage below.
  *   - `pushAggregation` (SupportsPushDownAggregates): an ungrouped
  *     COUNT(*) / MIN(doc_id) / MAX(doc_id) — possibly over a pushed
  *     doc_id range — COMPLETELY collapses to one computed row from
  *     the (lo, hi) bounds: one input partition, ZERO rows generated
  *     (`rowsGenerated` is the spec's observable), the analogue of a
  *     parquet footer-stats answer that never touches data pages.
  *   - Generation is per-partition and driver-free: the driver holds
  *     only (lo, hi, slice count).
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      slices = Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** The row formula — word k of doc id is w<(id·31 + k·7) mod 97>. */
  def textOf(id: Long): String = {
    val n = (id % 17 + 3).toInt
    (0 until n).map(k => "w" + ((id * 31 + k * 7) % 97)).mkString(" ")
  }
  def sourceOf(id: Long): String = "s" + (id % 5)

  /** Test observability hooks: the last read schema, planned slice
    * count, whether the last scan was a pushed-down aggregate, and a
    * counter of actually generated rows (a production connector would
    * expose these as scan metrics instead).
    */
  @volatile var lastReadSchema: StructType = _
  @volatile var lastPartitionCount: Int = _
  @volatile var lastAggPushed: Boolean = false
  val rowsGenerated = new java.util.concurrent.atomic.AtomicLong(0L)
}

private[sources] class SynthTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, slices)
}

private[sources] class SynthScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows - 1
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticDocs.schema
  private var aggFns: Seq[AggregateFunc] = Nil

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("doc_id", _: Long) | GreaterThan("doc_id", _: Long) |
           GreaterThanOrEqual("doc_id", _: Long) | LessThan("doc_id", _: Long) |
           LessThanOrEqual("doc_id", _: Long) => true
      case _ => false
    }
    supported.foreach {
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v)
      case _ => ()
    }
    pushed = supported
    // The doc_id range filters are CONSUMED: a conjunction of
    // =/</<=/>/>= on the generated id is applied EXACTLY by interval
    // intersection, so re-evaluation would be redundant — and an
    // empty post-scan filter set is the precondition for Spark to
    // offer aggregate pushdown. Everything else is retained for the
    // engine to re-apply.
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def isDocId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.toSeq == Seq("doc_id")
      case _ => false
    }
  private def supportedAgg(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case m: Min => isDocId(m.column)
    case m: Max => isDocId(m.column)
    case _ => false
  }

  /** Ungrouped COUNT(*)/MIN(doc_id)/MAX(doc_id) have closed-form
    * answers over the generated interval — complete pushdown, no
    * partial-merge round needed.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall(supportedAgg)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    if (!supportCompletePushDown(aggregation)) false
    else { aggFns = aggregation.aggregateExpressions.toSeq; true }

  override def build(): Scan = {
    SyntheticDocs.lastReadSchema = required
    SyntheticDocs.lastAggPushed = aggFns.nonEmpty
    if (aggFns.nonEmpty) new SynthAggScan(lo, hi, aggFns)
    else new SynthScan(rows, lo, hi, slices, required, pushed)
  }
}

/** Scan for a completely pushed-down aggregation: ONE partition, ONE
  * row computed from the (lo, hi) bounds — no document is ever
  * generated (the footer-stats fast path of a real columnar source).
  * Empty interval → SQL semantics for a global aggregate over zero
  * rows: count 0, min/max NULL.
  */
private[sources] class SynthAggScan(lo: Long, hi: Long, fns: Seq[AggregateFunc])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(fns.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs lo=$lo hi=$hi PushedAggregates: [${fns.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    SyntheticDocs.lastPartitionCount = 1
    Array(SynthRange(lo, hi))
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // v2 AggregateFunc isn't guaranteed serializable — precompute the
    // answers driver-side and ship only those.
    val empty = hi < lo
    val values: Array[Any] = fns.map {
      case _: CountStar => (if (empty) 0L else hi - lo + 1).asInstanceOf[AnyRef]
      case _: Min => if (empty) null else lo.asInstanceOf[AnyRef]
      case _ => if (empty) null else hi.asInstanceOf[AnyRef]
    }.toArray[Any]
    new SynthAggReaderFactory(values)
  }
}

private[sources] class SynthAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
}

private[sources] case class SynthRange(lo: Long, hi: Long) extends InputPartition

private[sources] class SynthScan(rows: Long, lo: Long, hi: Long, slices: Int,
                                 required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs lo=$lo hi=$hi PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // the slice grid is fixed over [0, rows) and each slice intersects
    // the pushed bounds — slices wholly outside vanish, which is the
    // partition-pruning observable the spec checks
    val parts =
      if (hi < lo) Array.empty[InputPartition]
      else {
        val n = math.max(1, slices)
        val step = math.max(1L, (rows + n - 1) / n)
        (0 until n).iterator
          .map(i => SynthRange(math.max(lo, i * step), math.min(hi, (i + 1) * step - 1)))
          .filter(p => p.lo <= p.hi)
          .toArray[InputPartition]
      }
    SyntheticDocs.lastPartitionCount = parts.length
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory = new SynthReaderFactory(required)
}

private[sources] class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { id += 1; id <= r.hi }
      override def get(): InternalRow = {
        SyntheticDocs.rowsGenerated.incrementAndGet()
        // materialize ONLY the pruned fields: text never exists unless asked
        lazy val text = SyntheticDocs.textOf(id)
        val vals = fields.map {
          case "doc_id" => id.asInstanceOf[AnyRef]
          case "source" => UTF8String.fromString(SyntheticDocs.sourceOf(id))
          case "n_chars" => text.length.toLong.asInstanceOf[AnyRef]
          case "text" => UTF8String.fromString(text)
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
