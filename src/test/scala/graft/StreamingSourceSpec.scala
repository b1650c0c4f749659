package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.sources.{SyntheticDocs, SyntheticDocsStream}

/** The streaming rung of the DSv2 connector ladder
  * (sources/SyntheticDocsStream.scala): deterministic micro-batch
  * offsets, replayable partitions, resume-without-re-emission, and
  * column pruning on the streaming scan.
  *
  * planInputPartitions is invoked several times per micro-batch
  * (planning + per-job re-planning), so interval assertions compare
  * the DISTINCT planned sequence; the resume test uses a parquet sink
  * because the memory sink does not support checkpoint recovery.
  */
class StreamingSourceSpec extends SparkSpec {

  private def stream(rows: Int, rowsPerBatch: Int) =
    spark.readStream.format("graft.sources.SyntheticDocsStream")
      .option("rows", rows.toLong).option("rowsPerBatch", rowsPerBatch.toLong)
      .option("partitions", 3).load()

  private def plannedDistinct: Seq[(Long, Long)] =
    SyntheticDocsStream.plannedBatches.asScala.toSeq.filter(p => p._2 > p._1).distinct

  test("micro-batch source drains deterministically in rowsPerBatch steps") {
    SyntheticDocsStream.plannedBatches.clear()
    SyntheticDocsStream.committedOffsets.clear()
    val q = stream(rows = 250, rowsPerBatch = 100)
      .writeStream.format("memory").queryName("synth_stream_all").start()
    try q.processAllAvailable() finally q.stop()

    val rows = spark.table("synth_stream_all").collect()
    assert(rows.length == 250)
    val ids = rows.map(_.getAs[Long]("doc_id")).sorted
    assert(ids.head == 0L && ids.last == 249L && ids.distinct.length == 250)
    // replayable content: rows are pure functions of doc_id
    val r7 = rows.find(_.getAs[Long]("doc_id") == 7L).get
    assert(r7.getAs[String]("text") == SyntheticDocs.textOf(7L))
    assert(r7.getAs[String]("source") == SyntheticDocs.sourceOf(7L))
    // exact batch ladder from admission control: 100 + 100 + 50
    assert(plannedDistinct == Seq((0L, 100L), (100L, 200L), (200L, 250L)))
    // commits trail by one trigger (batch N commits when N+1 starts),
    // so the final 250 may still be pending when the query stops
    assert(SyntheticDocsStream.committedOffsets.asScala.toSeq
      .containsSlice(Seq(100L, 200L)))
  }

  test("restart resumes from the checkpointed offset without re-emission") {
    val ckpt = Files.createTempDirectory("synthstream_resume").toString
    val out = Files.createTempDirectory("synthstream_out").toString
    def run(rows: Int): Unit = {
      val q = stream(rows, rowsPerBatch = 100)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run(200)
    assert(spark.read.parquet(out).count() == 200)

    SyntheticDocsStream.plannedBatches.clear()
    // more data appears (rows grows 200 -> 300); same checkpoint
    run(300)
    assert(plannedDistinct == Seq((200L, 300L)),
      s"re-planned already-committed data: $plannedDistinct")
    val ids = spark.read.parquet(out).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(ids.length == 300 && ids.distinct.length == 300 && ids.last == 299L)
  }

  test("projection applies downstream of the streaming scan (no pushdown in micro-batch)") {
    // Engine behavior pinned: Spark does NOT run operator pushdown
    // (column pruning / filters) against MICRO-BATCH streaming scans —
    // the scan always reads the full schema and the projection is
    // applied as a post-scan operator. A production connector must
    // therefore keep its streaming read path cheap for unrequested
    // columns (or offer a schema option); the batch path of this same
    // generator (SourcesSpec) gets real pruneColumns calls.
    val q = stream(rows = 50, rowsPerBatch = 50).select("doc_id")
      .writeStream.format("memory").queryName("synth_prune").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("synth_prune").columns.toSeq == Seq("doc_id"))
    assert(SyntheticDocsStream.lastStreamReadSchema.fieldNames.toSeq ==
      Seq("doc_id", "source", "n_chars", "text"))
  }

  test("STREAMING WRITE: per-epoch 2PC publish, idempotent replayed epochs, checkpoint append") {
    import graft.sources.DocsSink
    val ckpt = Files.createTempDirectory("sinkstream_ckpt").toString
    val out = Files.createTempDirectory("sinkstream_out").toString
    def run(rows: Int, checkpoint: String): Unit = {
      val q = stream(rows, rowsPerBatch = 100)
        .writeStream.format("graft.sources.DocsSink").option("path", out)
        .option("checkpointLocation", checkpoint).start()
      try q.processAllAvailable() finally q.stop()
    }

    // 250 rows drain as epochs 0/1/2, each a manifest-gated publish.
    run(250, ckpt)
    assert(DocsSink.committedEpochs(out) == Seq(0L, 1L, 2L))
    assert(DocsSink.manifestEntries(out).map(_._2).sum == 250L)
    val read = spark.read.format("graft.sources.DocsSink").option("path", out).load()
    assert(read.count() == 250L)
    val ids = read.collect().map(_.getAs[Long]("doc_id")).sorted
    assert(ids.distinct.length == 250 && ids.last == 249L)

    // A FRESH-checkpoint query replays epochs 0/1/2 into the same
    // target: the epoch ledger makes every re-commit a no-op — the
    // manifest must not grow (the exactly-once half the sink owns).
    run(250, Files.createTempDirectory("sinkstream_ckpt2").toString)
    assert(DocsSink.committedEpochs(out) == Seq(0L, 1L, 2L))
    assert(DocsSink.manifestEntries(out).map(_._2).sum == 250L,
      "replayed epochs were double-published")
    // and replay attempts leave no staged leftovers behind
    val staging = java.nio.file.Paths.get(out, DocsSink.StagingName)
    assert(!Files.exists(staging) ||
      Files.list(staging).iterator().asScala.isEmpty)

    // Resuming the ORIGINAL checkpoint after the source grew publishes
    // only the new interval, as new epochs.
    run(400, ckpt)
    assert(DocsSink.committedEpochs(out).take(3) == Seq(0L, 1L, 2L))
    assert(DocsSink.committedEpochs(out).length >= 4)
    assert(DocsSink.manifestEntries(out).map(_._2).sum == 400L)
    val all = spark.read.format("graft.sources.DocsSink").option("path", out).load()
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(all.length == 400 && all.distinct.length == 400 && all.last == 399L)
  }

  test("STREAMING WRITE crash recovery: a crash between manifest move and epoch-ledger append RE-DELIVERS, never loses") {
    // The sink's declared re-delivery window (DocsSink.toStreaming
    // scaladoc): the commit publishes the manifest FIRST, appends the
    // epoch ledger SECOND, so a crash between the two leaves
    // {files moved, manifest appended, _epochs missing the epoch}.
    // This spec constructs exactly that on-disk state and proves the
    // recovery semantics: the replayed epoch publishes AGAIN
    // (at-least-once inside the commit point — duplicates, which a
    // downstream exact dedup can repair) rather than losing the rows
    // (which nothing could repair), and once the ledger entry lands
    // the sink is idempotent again.
    import graft.sources.DocsSink
    val out = Files.createTempDirectory("sinkcrash_out").toString
    def run(): Unit = {
      val q = stream(rows = 250, rowsPerBatch = 100)
        .writeStream.format("graft.sources.DocsSink").option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("sinkcrash_ckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // epochs 0/1/2 = rows [0,100) [100,200) [200,250)
    assert(DocsSink.committedEpochs(out) == Seq(0L, 1L, 2L))
    assert(DocsSink.manifestEntries(out).map(_._2).sum == 250L)

    // Simulate the crash: epoch 2's manifest move completed but the
    // ledger append did not (the exact state an interruption between
    // publish() and the _epochs move leaves behind).
    Files.write(java.nio.file.Paths.get(out, DocsSink.EpochsName),
      "0\n1".getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Recovery: Spark replays the epochs (fresh checkpoint = the full
    // replay). Epochs 0/1 are ledgered -> no-op; epoch 2 is NOT -> it
    // publishes a second time.
    run()
    assert(DocsSink.committedEpochs(out) == Seq(0L, 1L, 2L),
      "recovery must re-ledger the interrupted epoch")
    assert(DocsSink.manifestEntries(out).map(_._2).sum == 300L,
      "the interrupted epoch must be re-delivered (250 + 50 dup rows)")
    val byId = spark.read.format("graft.sources.DocsSink").option("path", out)
      .load().collect().map(_.getAs[Long]("doc_id"))
      .groupBy(identity).view.mapValues(_.length).toMap
    // nothing lost: every id present; re-delivery is EXACTLY the
    // interrupted epoch's interval, duplicated once
    assert((0L until 250L).forall(byId.contains), "rows lost in recovery")
    assert((0L until 200L).forall(byId(_) == 1), "pre-crash epochs double-published")
    assert((200L until 250L).forall(byId(_) == 2), "interrupted epoch not re-delivered")

    // And the ledger entry restores idempotence: one more full replay
    // publishes nothing.
    run()
    assert(DocsSink.manifestEntries(out).map(_._2).sum == 300L,
      "ledgered epochs must be no-ops after recovery")
  }
}
