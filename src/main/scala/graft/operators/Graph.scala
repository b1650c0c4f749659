package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the missing middle of a
  * dedup pipeline: pair finders (minhash/simhash/embedding buckets)
  * emit edges, but choosing ONE canonical document per duplicate
  * cluster requires the transitive closure of those pairs.
  *
  * Implemented as alternating large-star / small-star rounds (Kiveris
  * et al., "Connected Components in MapReduce and Beyond"): converges
  * in O(log n) rounds regardless of component diameter, unlike naive
  * min-label propagation whose round count is the graph diameter (a
  * 10^6-long near-dup chain would need 10^6 shuffles; this needs ~20).
  * Each round is two aggregate+join shuffles over (long, long) pairs —
  * ids only, never payloads — so the 100 TB corpus contributes only
  * its duplicate-pair ids to the iteration.
  */
object Graph {

  /** Drop the storage blocks behind a locally-checkpointed frame.
    * Dataset.unpersist only clears plan caches — the checkpoint's RDD
    * must be unpersisted directly, and it sits in the LogicalRDD leaf
    * the checkpoint call left as the frame's plan.
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** (id, component) for every vertex incident to an edge; component
    * is the minimum vertex id in the connected component. Edges are
    * treated as undirected; self-loops ignored. `maxRounds` bounds the
    * driver loop (20 covers any graph up to ~2^20 diameter after the
    * first round's star-collapse). If the edge set has not converged
    * when `maxRounds` is exhausted the mapping would be WRONG (some
    * vertices not yet linked to their component minimum), so this
    * throws rather than return it — raise `maxRounds` for adversarial
    * graphs deeper than ~2^maxRounds.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String, maxRounds: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    var e = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // Convergence = identical edge set. Both sides are distinct (u,v)
    // sets, so count + order-free xor-of-hashes is an exact compare
    // (xor, not sum: sum overflows Long under ANSI mode). The previous
    // round's signature is remembered, so each round runs ONE small
    // aggregate over the just-checkpointed edges, not two.
    val sig = (d: DataFrame) =>
      d.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
    var prevSig = sig(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      // The eager checkpoint above materialized `next` from `e`, so
      // the previous round's checkpoint blocks are dead weight from
      // here on — without this unpersist every round of a deep run
      // stays pinned in executor storage until the session ends (the
      // final round's blocks, which back the returned frame, are the
      // only ones that must survive).
      releaseCheckpoint(e)
      val nextSig = sig(next)
      converged = nextSig == prevSig
      prevSig = nextSig
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds; " +
          "the partial mapping would be incorrect — increase maxRounds")

    // Final state is a star forest: (child, root) edges with root = min
    // id of the component. Roots name their own component.
    val children = e.select(col("u").as("id"), col("v").as("component"))
    val roots = e.select(col("v").as("id")).distinct()
      .join(children.select(col("id")), Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    children.unionByName(roots)
  }

  /** connectedComponents plus singleton vertices from `vertices(idCol)`
    * (a vertex with no duplicate pair is its own component).
    */
  def connectedComponentsAll(edges: DataFrame, src: String, dst: String,
                             vertices: DataFrame, idCol: String): DataFrame = {
    val cc = connectedComponents(edges, src, dst)
    val singletons = vertices.select(col(idCol).cast("long").as("id"))
      .join(cc.select("id"), Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    cc.unionByName(singletons)
  }

  /** Large-star: for every vertex u, link each strictly-larger
    * neighbor to the minimum of u's closed neighborhood. Keeps large
    * components shrinking toward their minimum in O(log n) rounds.
    */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient each edge high→low, then link every smaller
    * neighbor (and u itself) to the minimum seen.
    */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    val relinked = oriented.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
    val selfEdges = mins.select(col("u"), col("m").as("v"))
    relinked.unionByName(selfEdges)
      .filter(col("u") =!= col("v"))
      .distinct()
  }
}
