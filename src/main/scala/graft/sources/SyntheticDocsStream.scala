package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 MICRO-BATCH STREAMING source — the streaming rung of
  * the connector ladder (batch read w/ pushdown → aggregate pushdown
  * → two-phase-commit write → now readStream): the same deterministic
  * document generator exposed as an unbounded-ish stream with exact
  * offset accounting.
  *
  *   spark.readStream.format("graft.sources.SyntheticDocsStream")
  *     .option("rows", 250).option("rowsPerBatch", 100).load()
  *
  * Offset = the count of rows emitted so far (an exclusive
  * high-water doc_id). The contract a REAL streaming connector must
  * honor, all observable in the spec:
  *
  *   - **Admission control**: `latestOffset(start, limit)` advances
  *     at most rowsPerBatch past the engine-supplied START offset, so
  *     batch boundaries are deterministic functions of the offset log
  *     — never of wall-clock or source-object state. A restarted
  *     query (fresh stream object, restored offsets) therefore plans
  *     the IDENTICAL next batch.
  *   - **Replayability**: `planInputPartitions(start, end)` generates
  *     rows purely from the [start, end) id interval — any batch can
  *     be re-executed after failure and produce byte-identical rows
  *     (the Kafka-offset property synthetic form).
  *   - **Resume without re-emission**: on restart the engine hands
  *     back the checkpointed offset via `deserializeOffset`; nothing
  *     below it is ever planned again (spec: second run plans only
  *     the new interval).
  *   - **No operator pushdown in micro-batch mode** (engine behavior
  *     the spec pins): Spark never calls pruneColumns/pushFilters on
  *     a MICRO-BATCH streaming scan — the projection applies
  *     post-scan, so a streaming connector must keep unrequested
  *     columns cheap; the batch path of this generator gets real
  *     pruning (SourcesSpec).
  */
class SyntheticDocsStream extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthStreamTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      rowsPerBatch = Option(properties.get("rowsPerBatch")).map(_.toLong).getOrElse(100L),
      slices = Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object SyntheticDocsStream {
  /** Test observability: planned batch intervals, committed offsets,
    * and the pruned schema of the last streaming scan. */
  val plannedBatches = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long)]()
  val committedOffsets = new java.util.concurrent.CopyOnWriteArrayList[Long]()
  @volatile var lastStreamReadSchema: StructType = _
}

private[sources] class SynthStreamTable(rows: Long, rowsPerBatch: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs_stream($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthStreamScanBuilder(rows, rowsPerBatch, slices)
}

private[sources] class SynthStreamScanBuilder(rows: Long, rowsPerBatch: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SyntheticDocs.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def description(): String =
      s"SyntheticDocsStream rows=$rows rowsPerBatch=$rowsPerBatch " +
        s"ReadSchema: ${required.catalogString}"
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
      SyntheticDocsStream.lastStreamReadSchema = required
      new SynthMicroBatchStream(rows, rowsPerBatch, slices, required)
    }
  }
}

private[sources] case class SynthStreamOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class SynthMicroBatchStream(rows: Long, rowsPerBatch: Long,
                                             slices: Int, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = SynthStreamOffset(0L)

  override def deserializeOffset(json: String): Offset =
    SynthStreamOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  /** Deterministic admission control: advance at most the read limit
    * past the engine-supplied start — never past the available rows.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SynthStreamOffset].n
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => rowsPerBatch
    }
    SynthStreamOffset(math.min(rows, from + step))
  }

  /** Legacy no-arg form (unused once SupportsAdmissionControl is
    * detected): everything generated so far is available. */
  override def latestOffset(): Offset = SynthStreamOffset(rows)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SynthStreamOffset].n
    val hi = end.asInstanceOf[SynthStreamOffset].n // exclusive
    SyntheticDocsStream.plannedBatches.add((lo, hi))
    if (hi <= lo) Array.empty
    else {
      val n = math.max(1, slices)
      val span = hi - lo
      val step = math.max(1L, (span + n - 1) / n)
      (0 until n).iterator
        .map(i => SynthRange(lo + i * step, math.min(hi - 1, lo + (i + 1) * step - 1)))
        .filter(p => p.lo <= p.hi)
        .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)

  override def commit(end: Offset): Unit =
    SyntheticDocsStream.committedOffsets.add(end.asInstanceOf[SynthStreamOffset].n)

  override def stop(): Unit = ()
}
