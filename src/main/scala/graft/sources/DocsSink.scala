package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path — the last rung of the source-API ladder
  * (SyntheticDocs covers reads with filter/prune/aggregate pushdown;
  * this sibling covers the two-phase commit protocol a real sink must
  * implement):
  *
  *   df.write.format("graft.sources.DocsSink")
  *     .option("path", dir).mode("append").save()
  *
  * Protocol, exactly as a production object-store sink stages it:
  *   - each task's [[DataWriter]] streams rows to a STAGED file under
  *     `path/_staging/` (unique per task attempt), visible to nobody;
  *   - task `commit()` seals the file and returns a commit message
  *     carrying (staged path, partition id, task id, row count);
  *   - task `abort()` deletes the task's staged file — a failed or
  *     speculative attempt leaves nothing;
  *   - driver [[BatchWrite.commit]] MOVES every staged file into the
  *     target directory and then atomically publishes the `_manifest`
  *     (one line per committed task) — the manifest write is the
  *     commit point, exactly one message per input partition;
  *   - driver [[BatchWrite.abort]] removes any staged leftovers and
  *     publishes nothing: readers see the pre-job state.
  *
  * The read path lists ONLY manifest-listed files, so uncommitted or
  * orphaned part files are invisible by construction (the Iceberg/
  * Delta style metadata-gated read, scaled down to one manifest).
  * Rows travel as URL-encoded TSV — dependency-free, lossless for any
  * string content.
  *
  * Schema is fixed to the documents shape ([[SyntheticDocs.schema]]):
  * (doc_id long, source string, n_chars long, text string).
  */
class DocsSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("DocsSink requires a 'path' option"))
    new DocsSinkTable(path)
  }
}

object DocsSink {
  val ManifestName = "_manifest"
  val StagingName = "_staging"
  val EpochsName = "_epochs"

  /** Attempt-unique token baked into every staged (and therefore
    * published) filename. Without it, a job/epoch RETRY in a fresh
    * application re-derives the same (partitionId, taskId) pair as
    * the crashed attempt — Spark restarts task ids at 0 per app — and
    * the driver commit's strict ATOMIC_MOVE (deliberately not
    * REPLACE_EXISTING) would collide with the crashed attempt's
    * already-moved orphans and crash-loop the retry forever. One
    * token per writer factory = one per commit attempt; (pid, tid)
    * stays the discriminator within an attempt.
    */
  private[sources] def newAttemptId(): String =
    java.util.UUID.randomUUID().toString.substring(0, 8)

  private[sources] def manifestPath(dir: String): Path = Paths.get(dir, ManifestName)
  private[sources] def stagingDir(dir: String): Path = Paths.get(dir, StagingName)
  private[sources] def epochsPath(dir: String): Path = Paths.get(dir, EpochsName)

  /** Epoch ids already committed to `dir` by the streaming write
    * path, ledger order. */
  def committedEpochs(dir: String): Seq[Long] = {
    val f = epochsPath(dir)
    if (!Files.exists(f)) Nil
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(_.toLong)
  }

  /** Committed (file, rows, partitionId, taskId) entries, manifest order. */
  def manifestEntries(dir: String): Seq[(String, Long, Int, Long)] = {
    val mf = manifestPath(dir)
    if (!Files.exists(mf)) Nil
    else Files.readAllLines(mf, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map { line =>
        val Array(f, n, p, t) = line.split("\t")
        (f, n.toLong, p.toInt, t.toLong)
      }
  }
}

private[sources] class DocsSinkTable(path: String)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"docs_sink($path)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val expect = SyntheticDocs.schema.map(f => (f.name, f.dataType))
    val got = info.schema().map(f => (f.name, f.dataType))
    require(got == expect,
      s"DocsSink schema mismatch: expected $expect, got $got")
    new WriteBuilder {
      override def build(): Write = new DocsWrite(path)
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = SyntheticDocs.schema
      override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
      override def build(): Scan = new DocsSinkScan(path, required)
    }
}

private[sources] class DocsWrite(path: String) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String = s"DocsSink path=$path"

  /** STREAMING rung of the same sink: identical staged-file protocol,
    * plus the two things a streaming sink must add over a batch one —
    * the EPOCH in every staged name (a recovered epoch's retry must
    * not collide with its first attempt's leftovers) and an
    * IDEMPOTENT per-epoch commit: after failure Spark replays the
    * epoch and re-commits it, so a second commit of a ledgered epoch
    * must publish nothing (exactly-once = replayable source offsets +
    * idempotent sink commit, the Kafka-to-Delta contract in
    * miniature). The epoch ledger `_epochs` is appended ATOMICALLY
    * after the manifest move, so a crash between the two re-delivers
    * (at-least-once inside the commit point) rather than losing data.
    */
  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo): StreamingDataWriterFactory = {
      Files.createDirectories(DocsSink.stagingDir(path))
      // named top-level factory: an anonymous one closes over this
      // (non-serializable) Write object and fails task serialization
      new DocsStreamingWriterFactory(path, DocsSink.newAttemptId())
    }

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val entries = messages.map(_.asInstanceOf[DocsCommitMessage])
      if (DocsSink.committedEpochs(path).contains(epochId)) {
        // replayed epoch: drop the duplicate attempt's staged files,
        // publish nothing
        entries.foreach(m => Files.deleteIfExists(Paths.get(m.stagedPath)))
      } else {
        publish(entries)
        val ep = DocsSink.epochsPath(path)
        val prior = DocsSink.committedEpochs(path)
        val tmp = Paths.get(path).resolve(DocsSink.EpochsName + ".tmp")
        Files.write(tmp, (prior :+ epochId).mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, ep, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
    }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case m: DocsCommitMessage => Files.deleteIfExists(Paths.get(m.stagedPath))
        case _ => ()
      }
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(DocsSink.stagingDir(path))
    new DocsWriterFactory(path, DocsSink.newAttemptId())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    publish(messages.map(_.asInstanceOf[DocsCommitMessage]))
    cleanupStaging()
  }

  /** Shared visibility point of the batch and streaming commits: move
    * every staged file into the target dir, THEN atomically publish
    * the appended manifest.
    */
  private def publish(entries: Array[DocsCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    entries.foreach { m =>
      val staged = Paths.get(m.stagedPath)
      require(Files.exists(staged), s"staged file missing at job commit: $staged")
      Files.move(staged, dir.resolve(staged.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val prior = DocsSink.manifestEntries(path).map { case (f, n, p, t) =>
      s"$f\t$n\t$p\t$t"
    }
    val lines = prior ++ entries.map { m =>
      s"${Paths.get(m.stagedPath).getFileName}\t${m.rows}\t${m.partitionId}\t${m.taskId}"
    }
    val tmp = dir.resolve(DocsSink.ManifestName + ".tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, DocsSink.manifestPath(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // committed-task staged files plus any stragglers: all deleted,
    // nothing published
    messages.foreach {
      case m: DocsCommitMessage => Files.deleteIfExists(Paths.get(m.stagedPath))
      case _ => ()
    }
    cleanupStaging()
  }

  private def cleanupStaging(): Unit = {
    val staging = DocsSink.stagingDir(path)
    if (Files.exists(staging)) {
      Files.list(staging).iterator().asScala.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(staging)
    }
  }
}

private[sources] case class DocsCommitMessage(stagedPath: String, partitionId: Int,
                                              taskId: Long, rows: Long)
    extends WriterCommitMessage

private[sources] class DocsWriterFactory(path: String, attemptId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DocsDataWriter(path, partitionId, taskId, attemptId)
}

private[sources] class DocsStreamingWriterFactory(path: String, attemptId: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new DocsDataWriter(path, partitionId, taskId, attemptId, epochId)
}

/** epochId < 0 means a batch write; streaming writers carry the epoch
  * in the staged filename, and every writer carries the factory's
  * attempt token (see [[DocsSink.newAttemptId]]), so neither a
  * replayed epoch nor a retried job — even from a restarted
  * application whose task ids begin again at 0 — can collide with
  * leftovers from the attempt that crashed.
  */
private[sources] class DocsDataWriter(path: String, partitionId: Int, taskId: Long,
                                      attemptId: String, epochId: Long = -1L)
    extends DataWriter[InternalRow] {
  private val staged =
    DocsSink.stagingDir(path).resolve(
      if (epochId < 0) f"part-$partitionId%05d-t$taskId-$attemptId.tsv"
      else f"part-$partitionId%05d-t$taskId-e$epochId-$attemptId.tsv")
  private val out = Files.newBufferedWriter(staged, StandardCharsets.UTF_8)
  private var rows = 0L

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  override def write(record: InternalRow): Unit = {
    out.write(s"${record.getLong(0)}\t${enc(record.getUTF8String(1).toString)}\t" +
      s"${record.getLong(2)}\t${enc(record.getUTF8String(3).toString)}\n")
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    DocsCommitMessage(staged.toString, partitionId, taskId, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}

/** Manifest-gated read-back: one input partition per committed file;
  * files not in the manifest do not exist as far as the reader is
  * concerned. Column pruning is honored (decode only requested
  * fields).
  */
private[sources] class DocsSinkScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"DocsSink path=$path ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    DocsSink.manifestEntries(path)
      .map { case (f, _, _, _) => DocsFilePartition(Paths.get(path, f).toString) }
      .toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new DocsSinkReaderFactory(required)
}

private[sources] case class DocsFilePartition(file: String) extends InputPartition

private[sources] class DocsSinkReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[DocsFilePartition].file
    new PartitionReader[InternalRow] {
      private val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
      private val it = lines.iterator()
      private var cur: Array[String] = _
      private val fields = required.fieldNames

      private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

      override def next(): Boolean = {
        if (!it.hasNext) false
        else { cur = it.next().split("\t", -1); true }
      }
      override def get(): InternalRow = {
        val vals = fields.map {
          case "doc_id" => cur(0).toLong.asInstanceOf[AnyRef]
          case "source" => UTF8String.fromString(dec(cur(1)))
          case "n_chars" => cur(2).toLong.asInstanceOf[AnyRef]
          case "text" => UTF8String.fromString(dec(cur(3)))
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = lines.close()
    }
  }
}
