package graft

/** Driver-side reference implementations shared by the fuzz suites —
  * independently coded against the operators' documented semantics, never
  * calling into the engine under test. */
object FuzzOracles {

  /** Per-pair ±op liveness, the family convention: the LATEST batch
    * touching a pair decides, and within one batch an insert wins over a
    * delete of the same pair. */
  def survivors(schedule: Seq[Seq[(Long, Long, Int)]]): Set[(Long, Long)] = {
    val state = scala.collection.mutable.Map.empty[(Long, Long), Int]
    schedule.foreach { batch =>
      batch.groupBy(e => (e._1, e._2)).foreach { case (pair, ops) =>
        state(pair) = if (ops.exists(_._3 == 1)) 1 else -1
      }
    }
    // NOT `state.collect { case (pair, 1) => pair }`: collect on a Map
    // whose results are pairs builds a MAP, so two live edges sharing a
    // source node collide as keys and one is silently dropped
    state.filter(_._2 == 1).keySet.toSet
  }

  /** Min node id per component via union-find, over nodes with at least
    * one live edge. */
  def unionFind(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  /** Synchronous k-core peel to fixpoint: each round drops ALL nodes of
    * degree < k at once; survivors with their degrees in the peeled
    * subgraph. */
  def brutePeel(edges: Set[(Long, Long)], k: Int): Map[Long, Long] = {
    var cur = edges
    var changed = true
    while (changed) {
      val deg = cur.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val next = cur.filter { case (a, b) => keep(a) && keep(b) }
      changed = next != cur
      cur = next
    }
    cur.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
  }

  /** Synchronous k-truss support peel to fixpoint: each round drops every
    * edge with triangle support < k−2 at once; survivors with their
    * supports in the peeled subgraph. */
  def bruteTruss(edges: Set[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    def supports(cur: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = cur.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSet }
      cur.map { case (a, b) => (a, b) -> (adj(a) & adj(b)).size.toLong }.toMap
    }
    var cur = edges
    var changed = true
    while (changed) {
      val kept = supports(cur).filter(_._2 >= k - 2).keySet
      changed = kept != cur
      cur = kept.toSet
    }
    supports(cur)
  }

  /** Per-part corner counts of the capped bipartite projection's
    * triangles (q83 semantics). */
  def bruteTriangles(pairs: Set[(Long, Long)], cap: Long): Map[Long, Long] = {
    val bySu = pairs.groupBy(_._2).filter(_._2.map(_._1).size <= cap)
    val edges = bySu.values.flatMap { ps =>
      val parts = ps.map(_._1).toSeq.sorted
      for (i <- parts.indices; j <- i + 1 until parts.size) yield (parts(i), parts(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val tris = for {
      (a, b) <- edges.toSeq
      z <- adj(a) if z > b && adj(b)(z)
    } yield (a, b, z)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  /** Dijkstra over undirected weighted edges. */
  def dijkstra(edges: Set[(Long, Long)], wOf: (Long, Long) => Long,
      source: Long, budget: Long): Map[Long, Long] = {
    val adj = edges.toSeq
      .flatMap { case (a, b) => Seq(a -> (b, wOf(a, b)), b -> (a, wOf(a, b))) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map(source -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, source))(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) adj.getOrElse(u, Nil).foreach { case (v, w) =>
        if (dist.get(v).forall(_ > d + w)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
      }
    }
    dist.filter(_._2 <= budget).toMap
  }
}
