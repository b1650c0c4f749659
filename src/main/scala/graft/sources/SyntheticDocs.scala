package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
  *     equivalent of partition pruning + row-group skipping. All
  *     filters are also RETAINED (returned back to Spark) so the
  *     engine re-applies them exactly: pushdown here is a fast-path,
  *     never a correctness dependency.
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

  /** Test observability hooks: the last read schema and planned slice
    * count, recorded at scan-build time (a production connector would
    * expose these as scan metrics instead).
    */
  @volatile var lastReadSchema: StructType = _
  @volatile var lastPartitionCount: Int = _
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
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows - 1
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticDocs.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, _) = filters.partition {
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
    // retain EVERYTHING: the source narrows the generated interval but
    // Spark still evaluates each predicate — pushdown stays a
    // fast-path, never a correctness dependency
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    SyntheticDocs.lastReadSchema = required
    new SynthScan(rows, lo, hi, slices, required, pushed)
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
