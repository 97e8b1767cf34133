package graft.graph

import org.apache.spark.graphx.Graph
import org.apache.spark.storage.StorageLevel

import scala.collection.concurrent.TrieMap

/** Named registry of materialized weighted graph projections — the Spark
  * equivalent of the reference's GDS graph catalog
  * (`gds.graph.project` / `gds.graph.list` / `gds.graph.drop`,
  * `/root/reference/src/database.rs:387-456`).
  *
  * Reference semantics preserved:
  *  - `exists` / `list` (`database.rs:387-400`)
  *  - `drop` unpersists and unregisters (`database.rs:402-420`)
  *  - `getOrCreate` = lazy projection build on first query
  *    (`main.rs:178-185`)
  *  - `refresh` = atomic swap: the new projection is materialized *before*
  *    the catalog pointer moves, so concurrent readers never observe a
  *    half-built graph (improves on the reference's drop-then-rebuild race,
  *    `database.rs:468-482`, without changing observable results).
  */
final class GraphCatalog[V, E] {
  private val graphs = TrieMap.empty[String, Graph[V, E]]

  def list: Seq[String] = graphs.keys.toSeq.sorted

  def exists(name: String): Boolean = graphs.contains(name)

  def getOrCreate(name: String, build: () => Graph[V, E]): Graph[V, E] =
    graphs.getOrElseUpdate(name, materialize(build()))

  /** Build-then-swap; old projection is unpersisted after the swap. */
  def refresh(name: String, build: () => Graph[V, E]): Graph[V, E] = {
    val fresh = materialize(build())
    val old = graphs.put(name, fresh)
    old.foreach(_.unpersist(blocking = false))
    fresh
  }

  def drop(name: String): Boolean =
    graphs.remove(name) match {
      case Some(g) => g.unpersist(blocking = false); true
      case None => false
    }

  def dropAll(): Unit = list.foreach(drop)

  /** Cache and force materialization so queries never pay projection cost.
    * Graph builders (e.g. `Graph.fromEdges`) usually pre-assign a storage
    * level; only persist when none is set. */
  private def materialize(g: Graph[V, E]): Graph[V, E] = {
    val cached =
      if (g.vertices.getStorageLevel == StorageLevel.NONE &&
        g.edges.getStorageLevel == StorageLevel.NONE)
        g.persist(StorageLevel.MEMORY_AND_DISK)
      else g
    cached.vertices.count() // force materialization
    cached.edges.count()
    cached
  }
}
