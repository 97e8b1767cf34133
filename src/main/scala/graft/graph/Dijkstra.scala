package graft.graph

import org.apache.spark.graphx._

import scala.reflect.ClassTag

/** Weighted single-source shortest paths with path reconstruction.
  *
  * The reference delegates this to Neo4j GDS
  * (`gds.shortestPath.dijkstra.stream`, `/root/reference/src/database.rs:484-513`).
  * GraphX's built-in `lib.ShortestPaths` is hop-count only (no weights, no
  * path), so this is a custom Pregel program.
  *
  * Design for scale: vertex state is `(dist, predecessor)` — O(1) per vertex,
  * not O(path) — so messages stay constant-size no matter how long paths get.
  * Path reconstruction is a separate walk over the predecessor pointers; for
  * the reference's 8.5k-node map a driver-side walk over the collected
  * (id → pred) map is optimal, while `reconstructDistributed` does the same
  * via iterative joins for graphs whose vertex set cannot be collected.
  *
  * Semantics preserved from GDS (SURVEY.md §2.7): directed traversal,
  * non-negative weights, unreachable target → None (reference maps this to
  * HTTP 404), one optimal path returned with deterministic tie-breaking
  * (min predecessor id — GDS ties are arbitrary, ours are stable for tests).
  */
object Dijkstra {

  /** dist + predecessor per vertex; unreached = (+inf, -1). */
  type State = (Double, VertexId)

  /** Supersteps between lineage truncations in the iterative engines.
    *
    * Caching bounds RECOMPUTATION but not the RDD dependency graph: every
    * superstep's join/aggregate adds a layer, and past a few hundred
    * supersteps the DAGScheduler's recursive lineage walk overflows the
    * stack — measured: the opt-in `hidiam_w5` GraphBench shape (~1,600
    * supersteps at n=100k) killed the un-truncated label-correcting
    * engine with 64 StackOverflowErrors after 11 min, while the shipped
    * shapes (≤ ~370 supersteps) were fine. Every [[CheckpointInterval]]
    * supersteps the engines therefore materialize the vertex state,
    * cut its lineage (`localCheckpoint`, or a reliable `checkpoint` when
    * `spark.graft.checkpointDir` is set — prefer that on a real cluster,
    * where losing an executor must not lose truncated state), and rebuild
    * the graph over a pre-truncated static edge RDD. 64 keeps worst-case
    * lineage depth well under the observed failure threshold while making
    * the truncation cost (~one graph rebuild) invisible on shallow runs:
    * any run under 64 supersteps — every shipped query and benchmark
    * shape — never truncates and pays nothing. */
  val CheckpointInterval: Int = 64

  /** Cut `gr`'s lineage: materialize vertex state into a fresh root RDD
    * and rebuild the graph over `edgeRaw` (a static, already-truncated
    * edge RDD). Both views are materialized before the parent graph and
    * the previous truncation root are unpersisted (the quadratic-loop
    * guard). Returns the rebuilt graph and the new root; the caller
    * passes the root back on the next call so it can be released. */
  private def truncatedGraph(gr: Graph[State, Double],
      edgeRaw: org.apache.spark.rdd.RDD[Edge[Double]],
      prevRoot: Option[org.apache.spark.rdd.RDD[(VertexId, State)]])
      : (Graph[State, Double], org.apache.spark.rdd.RDD[(VertexId, State)]) = {
    val sc = gr.vertices.sparkContext
    val vraw = gr.vertices.map(v => v)
    if (sc.getCheckpointDir.isDefined) vraw.checkpoint() else vraw.localCheckpoint()
    val g2 = Graph(vraw, edgeRaw, (Double.PositiveInfinity, -1L)).cache()
    g2.vertices.count(); g2.edges.count()
    prevRoot.foreach(_.unpersist(blocking = false))
    gr.unpersistVertices(blocking = false)
    gr.edges.unpersist(blocking = false)
    (g2, vraw)
  }

  /** Max relaxation rounds chained lazily into ONE Spark job (superstep
    * batching). After [[adaptParts]] the per-superstep cost on a
    * high-diameter graph is almost pure per-JOB fixed cost — job
    * submission, per-round cache materialization, the `count()` round
    * trip — at ~0.07 s/superstep × 3,373 supersteps ≈ 230 s on the r7
    * hidiam probe. GraphX's `outerJoinVertices` and
    * `aggregateMessagesWithActiveSet` are pure RDD transformations, so k
    * rounds of (join → relax) can be CHAINED LAZILY and materialized by a
    * single action: job count drops ~k×, while per-round semantics are
    * untouched (each chained round computes exactly the messages the
    * unbatched superstep would — the fixpoint, including the min-pred
    * tie-break, is identical; the engine-equality specs run entirely
    * through this path). Batch size DOUBLES from 1 up to this cap, so
    * shallow runs (every shipped query; the expander/wide GraphBench
    * shapes) pay at most a handful of wasted no-op rounds inside one job
    * — an empty active set costs one near-instant stage. Rounds per batch
    * are additionally bounded by the remaining [[CheckpointInterval]]
    * budget so lineage truncation still lands on schedule, and by
    * remaining `maxIterations` so bounded-propagation callers execute
    * EXACTLY the same number of rounds as the unbatched loop. Chained
    * intermediate graphs (whose vertex RDDs GraphX caches internally) are
    * tracked and unpersisted as soon as the batch's one action lands.
    *
    * The cap is MEASURED, not theorized (`GRAPHBENCH_r09.json`, hidiam
    * batchMax sweep {1, 8, 16, 32, 64}, every leg equality-checked): the
    * win saturates at 8 and REVERSES past 16 — x8 169.9/163.7 s and x16
    * 165.6/169.7 s (pregel/delta; 121/121 s in the calmest capture) vs
    * x1's 224.1/203.3 s, but x32 189.9/208.1 s and x64 209.2/231.6 s.
    * Two costs grow with the cap: batch-boundary PADDING (doubling past
    * the fixpoint runs chained no-op rounds — 5.6% of rounds at x8 vs
    * 31% at x32, 33% at x64, from the sweep's rounds-executed counters)
    * and the peak cache footprint of the chained interim vertex RDDs
    * (GraphX caches each round's until the batch's action lands — k× the
    * unbatched working set, the r8 advisory's concern). 8 takes most of
    * the job-count reduction (3,373 → 599 actions) at 1/4 the interim
    * footprint of 32 and the least padding; the round-10 interleaved
    * same-JVM A/B (`GRAPHBENCH_r10_ab.json`) broke the 8-vs-16 tie:
    * pregel still ties, delta-stepping prefers 8 on median and min —
    * the default stands on data. */
  val SuperstepBatchMax: Int = 8

  /** Target edges per partition for the iterative engines — the knob that
    * governs PER-SUPERSTEP FIXED COST. Every superstep is one Spark job
    * whose latency floor is task scheduling + closure shipping per task;
    * a graph inherited at the session's default parallelism (32 here)
    * pays that floor 32× per superstep even when each task holds a few
    * thousand edges. High-diameter graphs multiply it by thousands of
    * supersteps: the r6 hidiam probe (400k edges, 3,373 supersteps, 32
    * partitions) spent ~0.4 s/superstep almost entirely on fixed cost.
    * The engines therefore COALESCE the working graph so each partition
    * holds ≥ this many edges (never repartitioning upward, so a genuinely
    * large graph keeps its parallelism — at 100 TB the edge count divided
    * by 128Ki exceeds any cluster's cores and this is a no-op). The graph
    * analog of AQE's small-shuffle-partition coalescing. */
  val EdgesPerPartition: Long = 131072L

  /** Coalesce `g0`'s edge and vertex RDDs down to edge-count/
    * [[EdgesPerPartition]] partitions (narrow dependency, no shuffle);
    * no-op when the graph is already at or below that width. The rebuilt
    * graph is materialized before the parent is released. */
  private def adaptParts(g0: Graph[State, Double]): Graph[State, Double] = {
    val nE = g0.edges.count() // materializes g0's edges (cached by caller)
    val parts = g0.edges.getNumPartitions
    val target = math.max(1L, (nE + EdgesPerPartition - 1L) / EdgesPerPartition)
    if (target >= parts) g0
    else {
      val e2 = g0.edges.map(e => Edge(e.srcId, e.dstId, e.attr)).coalesce(target.toInt)
      val v2 = g0.vertices.map(v => v).coalesce(target.toInt)
      val g2 = Graph(v2, e2, (Double.PositiveInfinity, -1L)).cache()
      g2.vertices.count(); g2.edges.count()
      g0.unpersistVertices(blocking = false)
      g0.edges.unpersist(blocking = false)
      g2
    }
  }

  private def mergeState(a: State, b: State): State =
    if (a._1 < b._1) a
    else if (b._1 < a._1) b
    else if (a._2 <= b._2) a else b // equal dist: deterministic min-pred tie-break

  private def sendImprove(ctx: EdgeContext[State, Double, State]): Unit = {
    val cand = ctx.srcAttr._1 + ctx.attr
    val dst = ctx.dstAttr
    // strict improvement, or equal-dist better tie-break, propagates
    if (cand < dst._1 || (cand == dst._1 && ctx.srcId < dst._2))
      ctx.sendToDst((cand, ctx.srcId))
  }

  /** `maxIterations` bounds supersteps (diameter bound) — the at-scale
    * guard SURVEY §7.4 calls for; default unbounded = exact fixpoint,
    * identical to GDS.
    *
    * This is Pregel's exact label-correcting loop written out (same
    * initial full gather, same receiver-only vprog, same
    * `EdgeDirection.Out` active set) — explicit for two reasons
    * `Graph.pregel` can't deliver: lineage truncation every
    * [[CheckpointInterval]] supersteps (the built-in overflowed the stack
    * on the ~1,600-superstep hidiam probe), and SUPERSTEP BATCHING
    * ([[SuperstepBatchMax]]): up to 32 (join → relax) rounds chained
    * lazily per Spark job instead of Pregel's one-job-one-count-per-
    * superstep discipline. After a truncation the frontier is re-derived
    * with one full-edge gather: `sendImprove`'s guard reads the CURRENT
    * destination state, so exactly the still-improving messages
    * regenerate — the fixpoint, including the min-pred tie-break, is
    * unchanged. */
  def sssp[V: ClassTag](g: Graph[V, Double], source: VertexId,
      maxIterations: Int = Int.MaxValue,
      batchMax: Int = SuperstepBatchMax): Graph[State, Double] = {
    require(g.edges != null)
    require(batchMax >= 1, s"batchMax must be >= 1, got $batchMax")
    import org.apache.spark.graphx.graftbridge.GraphXBridge
    var cur: Graph[State, Double] = adaptParts(g.mapVertices((id, _) =>
      if (id == source) (0.0, id) else (Double.PositiveInfinity, -1L)).cache())

    var edgeRaw: org.apache.spark.rdd.RDD[Edge[Double]] = null
    var lastRoot: Option[org.apache.spark.rdd.RDD[(VertexId, State)]] = None
    def truncate(): Unit = {
      if (edgeRaw == null) { // derive once, from the CACHED current graph
        edgeRaw = cur.edges.map(e => Edge(e.srcId, e.dstId, e.attr))
        if (cur.vertices.sparkContext.getCheckpointDir.isDefined) edgeRaw.checkpoint()
        else edgeRaw.localCheckpoint()
        edgeRaw.count()
      }
      val (g2, root) = truncatedGraph(cur, edgeRaw, lastRoot)
      cur = g2; lastRoot = Some(root)
    }

    var msgs = cur.aggregateMessages[State](sendImprove, mergeState).cache()
    var n = msgs.count() // materializes cur too
    var iters = 0
    var sinceTrunc = 0
    var batch = 1 // superstep-batching doubling, up to [[SuperstepBatchMax]]
    while (n > 0 && iters < maxIterations) {
      // chain `rounds` (join → active-set relax) steps lazily; ONE count
      // materializes the whole chain (the final graph is cached, so the
      // action populates it before any parent is released)
      val rounds = math.max(1, math.min(batch,
        math.min(maxIterations - iters, CheckpointInterval - sinceTrunc)))
      // (rounds is also <= batchMax because batch never exceeds it)
      val prev = cur
      val prevMsgs = msgs
      val interim = scala.collection.mutable.ListBuffer.empty[Graph[State, Double]]
      var cm: VertexRDD[State] = msgs
      var i = 0
      while (i < rounds) {
        val joined = cur.outerJoinVertices(cm) { (_, old, m) =>
          m.map(mergeState(old, _)).getOrElse(old)
        }
        if (i < rounds - 1) interim += joined else joined.cache()
        cur = joined
        cm = GraphXBridge.aggregateMessagesWithActiveSet[State, Double, State](
          cur, sendImprove, mergeState, TripletFields.All, cm, EdgeDirection.Out)
        i += 1
      }
      msgs = cm.cache()
      n = msgs.count() // the one action per batch
      iters += rounds; sinceTrunc += rounds
      prevMsgs.unpersist(blocking = false)
      prev.unpersistVertices(blocking = false)
      prev.edges.unpersist(blocking = false)
      // GraphX's outerJoinVertices caches each round's vertex RDD
      // internally — release the intermediates now that the batch landed
      interim.foreach { ig =>
        ig.unpersistVertices(blocking = false)
        ig.edges.unpersist(blocking = false)
      }
      if (sinceTrunc >= CheckpointInterval && n > 0 && iters < maxIterations) {
        msgs.unpersist(blocking = false)
        truncate()
        sinceTrunc = 0
        // full gather re-derives the SAME frontier against the rebuilt
        // graph (not an extra superstep: sendImprove reads current state)
        msgs = cur.aggregateMessages[State](sendImprove, mergeState).cache()
        n = msgs.count()
      }
      batch = math.min(batchMax, batch << 1)
    }
    msgs.unpersist(blocking = false)
    cur
  }

  /** Distances only, as (vertexId, dist) for reachable vertices. */
  def distances[V: ClassTag](g: Graph[V, Double], source: VertexId): Seq[(VertexId, Double)] =
    sssp(g, source).vertices
      .filter { case (_, (d, _)) => !d.isInfinite }
      .map { case (id, (d, _)) => (id, d) }
      .collect()
      .toSeq

  // ---- delta-stepping (Meyer & Sanders) ----
  //
  // The plain Pregel program is label-correcting: every improved vertex
  // relaxes ALL its out-edges next superstep, so early over-estimates
  // propagate wavefronts that later get corrected — wasted messages and
  // supersteps on weighted graphs. Delta-stepping settles distance buckets
  // [bΔ, (b+1)Δ) in order: inside a bucket only LIGHT edges (w < Δ) need
  // the fixpoint loop; HEAVY edges (w ≥ Δ) always leave the bucket, so one
  // relaxation pass when the bucket settles suffices. Result: relaxations
  // from settled-or-nearly-settled distances only, with Δ trading
  // parallelism (big Δ → Bellman-Ford) against work (small Δ → Dijkstra).

  /** Δ multiplier over the mean edge weight. MEASURED, not theorized:
    * GRAPHBENCH_r04's sweep (Δ ∈ {0.5, 1, 2, 4, 8, 16, 32, ∞}×mean over
    * three 400k-vertex topologies — a low-diameter expander, the same
    * with 1..1000 weights, and a moderate-diameter sparse circulant)
    * shows run time monotonically IMPROVING with Δ on every shape,
    * plateauing by ~8–32×: fine buckets sequence the computation (the
    * 107-bucket x0.5 run on the sparse shape was 5× slower than x8) while
    * the bucket ceiling's benefit — deferring relaxations of far
    * overestimates — survives at coarse Δ. 32× sits on the plateau and
    * still bounds bucket count on any distance range, unlike Δ = ∞. */
  val DeltaMeanMultiplier: Double = 32.0

  /** Δ heuristic: [[DeltaMeanMultiplier]] × mean edge weight. (Round 3
    * used 1× mean — "half the edges light" — which GRAPHBENCH_r03 showed
    * LOSING to plain label-correcting Pregel; the round-4 sweep above
    * found the loss was all bucket-sequencing overhead.) */
  def chooseDelta[V: ClassTag](g: Graph[V, Double]): Double = {
    val (sum, n) = g.edges.map(e => (e.attr, 1L))
      .fold((0.0, 0L)) { case ((s, c), (w, k)) => (s + w, c + k) }
    if (n == 0L || sum <= 0.0) 1.0 else DeltaMeanMultiplier * sum / n
  }

  /** Bucketed SSSP with the exact (dist, pred) semantics of [[sssp]],
    * including the min-pred tie-break (the equality is provable: an
    * equal-dist predecessor of v is never in a later bucket than v, heavy
    * equal-dist preds of same-bucket vertices are impossible since
    * w ≥ Δ > dist(v) − dist(u), so the in-bucket light fixpoint plus one
    * heavy pass per settled bucket delivers every message the
    * label-correcting program would). `delta ≤ 0` auto-selects via
    * [[chooseDelta]].
    *
    * Two disciplines make the bucket loop competitive with Pregel's (which
    * gets both for free inside GraphX):
    *
    *  1. **Active-set relaxation** ([[GraphXBridge]]): each relax scans
    *     only the out-edges of a frontier VertexRDD — the vertices whose
    *     dist changed last round (they received messages), or the bucket's
    *     members at bucket open / heavy pass — instead of all |E| edge
    *     triplets per superstep. A vertex whose dist did NOT change since
    *     it last relaxed can only re-send byte-identical messages, which
    *     the destination already applied or rejected (sendMsg's condition
    *     depends on src dist, not src pred), so the restriction loses no
    *     messages. Without this, every superstep costs O(|E|) and
    *     delta-stepping's fewer-wasted-relaxations advantage drowns in
    *     full-graph scans (measured: 19.9 s vs 18.5 s label-correcting at
    *     5.6M edges in round 3; active-set flipped the comparison).
    *
    *  2. **One job per superstep** (Pregel's caching discipline): the next
    *     round's relax job itself materializes the joined graph — no
    *     separate vertices.count/edges.count actions — and the previous
    *     graph/messages unpersist only after that job completes, so no job
    *     ever re-walks lineage. */
  def deltaSssp[V: ClassTag](g: Graph[V, Double], source: VertexId,
      delta: Double = 0.0, stats: Option[DeltaStats] = None,
      batchMax: Int = SuperstepBatchMax): Graph[State, Double] = {
    import org.apache.spark.graphx.graftbridge.GraphXBridge
    require(batchMax >= 1, s"batchMax must be >= 1, got $batchMax")

    // the (dist, pred) tie-break lives in ONE place — [[mergeState]] —
    // which the documented sssp ≡ deltaSssp equality depends on
    val mergeMsg: (State, State) => State = mergeState

    def improved(old: State, m: State): Boolean =
      m._1 < old._1 || (m._1 == old._1 && m._2 < old._2)

    var cur: Graph[State, Double] = adaptParts(g.mapVertices((id, _) =>
      if (id == source) (0.0, id) else (Double.PositiveInfinity, -1L)).cache())
    cur.vertices.count(); cur.edges.count()

    // Δ selection and the heavy-edge probe scan CUR (just cached), never
    // the input graph: when the caller hands over an uncached lineage
    // (the DataFrame dispatch path), scanning `g` re-runs the whole
    // edge-build per pass — two silent full passes that GRAPHBENCH_r04's
    // frame-dispatch row paid before this was moved
    // ONE fold computes the Δ statistics (sum, count — the chooseDelta
    // inputs) AND the max weight: the heavy-edge probe below compares
    // max against Δ, so the old separate filter().isEmpty() job over the
    // edge set is fused away (guide §2.4: two passes keyed the same way
    // share one)
    val (wSum, wN, wMax) = cur.edges
      .map(e => (e.attr, 1L, e.attr))
      .fold((0.0, 0L, Double.NegativeInfinity)) { case ((s1, c1, m1), (s2, c2, m2)) =>
        (s1 + s2, c1 + c2, math.max(m1, m2))
      }
    val dlt =
      if (delta > 0.0) delta
      else if (wN == 0L || wSum <= 0.0) 1.0
      else DeltaMeanMultiplier * wSum / wN
    stats.foreach(_.delta = dlt)

    // with a coarse Δ (the measured default) many graphs have NO heavy
    // edge at all — skipping the heavy phase saves a full relax per
    // bucket; the max from the shared fold answers it without a scan
    val anyHeavy = wMax >= dlt

    // periodic lineage truncation (see [[CheckpointInterval]]): high-
    // diameter graphs drive thousands of supersteps through this loop and
    // the un-truncated dependency chain overflows the DAGScheduler stack
    var edgeRaw: org.apache.spark.rdd.RDD[Edge[Double]] = null
    var lastRoot: Option[org.apache.spark.rdd.RDD[(VertexId, State)]] = None
    var sinceTrunc = 0
    def truncate(): Unit = {
      if (edgeRaw == null) { // derive once, from the CACHED current graph
        edgeRaw = cur.edges.map(e => Edge(e.srcId, e.dstId, e.attr))
        if (cur.vertices.sparkContext.getCheckpointDir.isDefined) edgeRaw.checkpoint()
        else edgeRaw.localCheckpoint()
        edgeRaw.count()
      }
      val (g2, root) = truncatedGraph(cur, edgeRaw, lastRoot)
      cur = g2; lastRoot = Some(root)
      sinceTrunc = 0
    }

    // relax out-edges of ACTIVE vertices whose dist lies in [lo, hi),
    // restricted to the light or heavy edge class; messages only when they
    // would improve the destination (dist, pred) as currently materialized
    def relax(lo: Double, hi: Double, lightPhase: Boolean,
        active: VertexRDD[_]): VertexRDD[State] =
      GraphXBridge.aggregateMessagesWithActiveSet[State, Double, State](
        cur,
        ctx => {
          val sd = ctx.srcAttr._1
          if (sd >= lo && sd < hi &&
            (if (lightPhase) ctx.attr < dlt else ctx.attr >= dlt)) {
            val cand = sd + ctx.attr
            if (cand < ctx.dstAttr._1 ||
              (cand == ctx.dstAttr._1 && ctx.srcId < ctx.dstAttr._2))
              ctx.sendToDst((cand, ctx.srcId))
          }
        },
        mergeMsg, TripletFields.All, active, EdgeDirection.Out)

    // fold msgs into a new graph; the caller's NEXT relax job materializes
    // it (and only then are the parents unpersisted)
    def join(msgs: VertexRDD[State]): Graph[State, Double] =
      cur.outerJoinVertices(msgs) { (_, old, m) =>
        m match {
          case Some(msg) if improved(old, msg) => msg
          case _ => old
        }
      }.cache()

    val debug = sys.env.contains("GRAFT_DELTA_DEBUG")
    var bucket = 0L
    var done = false
    while (!done) {
      val lo = bucket * dlt
      val hi = lo + dlt
      val t0 = if (debug) System.nanoTime() else 0L

      // light-edge fixpoint inside the current bucket: the opening frontier
      // is the bucket's members; afterwards only last round's receivers can
      // have changed dist. Improvements landing in later buckets are
      // recorded but deferred.
      val members = cur.vertices.filter { case (_, (d, _)) => d >= lo && d < hi }
      var msgs = relax(lo, hi, lightPhase = true, members).cache()
      var n = msgs.count() // the one action: also materializes `cur`
      var iters = 1
      var actions = 1L // materializing actions this bucket (≈ light jobs)
      sinceTrunc += 1
      var batch = 1 // superstep batching (see [[SuperstepBatchMax]])
      while (n > 0) {
        if (sinceTrunc >= CheckpointInterval) {
          // fold the pending frontier, truncate lineage, then re-open the
          // bucket — sendMsg's improvement guard reads the CURRENT dst
          // state, so exactly the still-improving in-bucket messages
          // (a superset of the pending frontier's effect) regenerate
          val prev = cur
          cur = join(msgs)
          cur.vertices.count(); cur.edges.count()
          prev.unpersistVertices(blocking = false)
          prev.edges.unpersist(blocking = false)
          msgs.unpersist(blocking = false)
          truncate()
          val reopened = cur.vertices.filter { case (_, (d, _)) => d >= lo && d < hi }
          msgs = relax(lo, hi, lightPhase = true, reopened).cache()
          n = msgs.count()
          iters += 1; sinceTrunc += 1; actions += 1L
        } else {
          // chain `rounds` (join → in-bucket relax) steps lazily and
          // materialize the whole chain with ONE count — job count per
          // bucket drops from the superstep count to ~log₂ of it
          val rounds = math.max(1, math.min(batch, CheckpointInterval - sinceTrunc))
          val prev = cur
          val prevMsgs = msgs
          val interim = scala.collection.mutable.ListBuffer.empty[Graph[State, Double]]
          var cm: VertexRDD[State] = msgs
          var i = 0
          while (i < rounds) {
            val joined = cur.outerJoinVertices(cm) { (_, old, m) =>
              m match {
                case Some(msg) if improved(old, msg) => msg
                case _ => old
              }
            }
            if (i < rounds - 1) interim += joined else joined.cache()
            cur = joined
            cm = relax(lo, hi, lightPhase = true, cm)
            i += 1
          }
          msgs = cm.cache()
          n = msgs.count() // the one action per batch
          iters += rounds; sinceTrunc += rounds; actions += 1L
          prevMsgs.unpersist(blocking = false)
          prev.unpersistVertices(blocking = false)
          prev.edges.unpersist(blocking = false)
          interim.foreach { ig =>
            ig.unpersistVertices(blocking = false)
            ig.edges.unpersist(blocking = false)
          }
          batch = math.min(batchMax, batch << 1)
        }
      }
      msgs.unpersist(blocking = false)

      // one heavy-edge pass from every settled member of this bucket
      if (anyHeavy) {
        val settled = cur.vertices.filter { case (_, (d, _)) => d >= lo && d < hi }
        val heavy = relax(lo, hi, lightPhase = false, settled).cache()
        sinceTrunc += 1
        if (heavy.count() > 0) {
          val prev = cur
          cur = join(heavy)
          cur.vertices.count(); cur.edges.count() // no follow-up job this phase
          prev.unpersistVertices(blocking = false)
          prev.edges.unpersist(blocking = false)
        }
        heavy.unpersist(blocking = false)
      }
      // bucket boundary is the natural cut point: no in-flight frontier,
      // cur is cached and materialized
      if (sinceTrunc >= CheckpointInterval) truncate()
      stats.foreach { st =>
        st.buckets += 1
        // counts ROUNDS EXECUTED: with superstep batching this is an
        // upper bound on true supersteps, rounded up to batch boundaries
        // (a fixpoint reached mid-batch still runs the chained no-op
        // rounds; each costs one near-empty stage inside the same job)
        st.lightSupersteps += iters
        st.heavySupersteps += (if (anyHeavy) 1 else 0)
        st.lightBatches += actions
      }

      // jump to the next non-empty bucket — ONE pass: fold to the minimum
      // pending bucket index with MaxValue as the empty sentinel (isEmpty
      // followed by min would evaluate the derived RDD twice per bucket)
      val nextBucket = cur.vertices
        .filter { case (_, (d, _)) => !d.isInfinite && d >= hi }
        .map { case (_, (d, _)) => math.floor(d / dlt).toLong }
        .fold(Long.MaxValue)(math.min)
      if (debug) println(f"[delta] bucket=$bucket inner=$iters ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // max(…, bucket+1) guards the float boundary: dist == hi can make
      // floor(dist/Δ) round back to the current bucket and stall the loop
      if (nextBucket == Long.MaxValue) done = true
      else bucket = math.max(nextBucket, bucket + 1L)
    }
    cur
  }

  /** Engine counters for one [[deltaSssp]] run.
    *
    * With superstep batching, `lightSupersteps` counts ROUNDS EXECUTED —
    * an upper bound on true (message-carrying) supersteps, rounded up to
    * batch boundaries: a fixpoint reached mid-batch still runs the
    * chained no-op rounds, each a near-empty stage inside the same job.
    * It is therefore NOT a job count any more; `lightBatches` counts the
    * materializing actions of the light phase (≈ light-phase job count,
    * ~log₂ of the round count on deep buckets), and each heavy superstep
    * remains one job. DijkstraSpec pins the accounting: batched
    * lightSupersteps ≥ the unbatched (batchMax = 1) count and ≤ it plus
    * one batch's padding per bucket. */
  final class DeltaStats {
    var delta: Double = 0.0
    var buckets: Long = 0L
    var lightSupersteps: Long = 0L
    var heavySupersteps: Long = 0L
    /** Materializing actions in the light phase (the per-batch counts). */
    var lightBatches: Long = 0L
    // `light_rounds` (r10): renamed from `light_supersteps`, whose meaning
    // silently changed in r9 from job count to rounds-executed (padded to
    // batch boundaries) — the old key under the new semantics made r7-era
    // artifact comparisons read as apples-to-apples when they weren't.
    // `note` records the break for anyone diffing historical GRAPHBENCH
    // artifacts.
    def json: String =
      s"""{"delta":$delta,"buckets":$buckets,"light_rounds":$lightSupersteps,"heavy_supersteps":$heavySupersteps,"light_batches":$lightBatches,"note":"light_rounds = rounds executed incl. batch padding (pre-r9 artifacts report this field as light_supersteps = jobs; not comparable)"}"""
  }

  /** Single-pair path as an ordered vertex-id list (source..target), or None
    * if unreachable — mirrors GDS stream yielding no row.
    *
    * @deprecated collects the FULL reachable (id → state) map to the
    * driver, which is exactly the scale-killer `autoPath` exists to avoid:
    * use [[autoPath]] (local heap below the edge threshold, distributed
    * predecessor walk via [[reconstructDistributed]] above it). Kept only
    * as the simplest reference implementation for equality tests. */
  @deprecated("use autoPath: this collects the full reachable vertex map to the driver", "round3")
  def shortestPath[V: ClassTag](
      g: Graph[V, Double], source: VertexId, target: VertexId): Option[(Double, Seq[VertexId])] = {
    val state = sssp(g, source).vertices
      .filter { case (_, (d, _)) => !d.isInfinite }
      .collectAsMap()
    state.get(target).map { case (dist, _) =>
      var ids = List(target)
      while (ids.head != source) ids = state(ids.head)._2 :: ids
      (dist, ids)
    }
  }

  // ---- scale-adaptive dispatch ----
  //
  // Pregel supersteps cost whole Spark jobs; on a fixture-sized graph that
  // overhead dwarfs the work (analogous to Catalyst choosing a broadcast
  // join for a small side). Below `localThreshold` edges we collect the edge
  // list and run a driver-local heap Dijkstra with identical semantics and
  // tie-breaking; above it, the Pregel program runs unchanged on the
  // cluster. The reference universe (~13.8k edges) always takes the local
  // path; the threshold keeps the distributed path for genuinely large
  // graphs.

  val DefaultLocalThreshold: Long = 2000000L

  /** Driver-local Dijkstra over an adjacency list; same (dist, pred) state
    * and min-pred tie-break as the Pregel program. */
  def localSssp(edges: Iterable[(VertexId, VertexId, Double)], source: VertexId): Map[VertexId, State] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)).toArray }
    val dist = scala.collection.mutable.HashMap.empty[VertexId, State]
    // min-heap on (dist, pred): with positive weights every equal-dist entry
    // for a vertex is enqueued before its first pop, so settling in
    // (dist, pred) order reproduces the Pregel min-pred tie-break exactly
    val pq = scala.collection.mutable.PriorityQueue.empty[(Double, VertexId, VertexId)](
      Ordering.by[(Double, VertexId, VertexId), (Double, VertexId, VertexId)](t => (t._1, t._3, t._2)).reverse)
    pq.enqueue((0.0, source, source))
    while (pq.nonEmpty) {
      val (d, id, pred) = pq.dequeue()
      val known = dist.get(id)
      val better = known.forall { case (kd, kp) => d < kd || (d == kd && pred < kp) }
      if (known.isEmpty) {
        dist(id) = (d, pred)
        adj.getOrElse(id, Array.empty).foreach { case (nxt, w) =>
          dist.get(nxt) match {
            case None => pq.enqueue((d + w, nxt, id))
            // zero-weight edges allow an equal-dist candidate to arrive
            // AFTER the neighbor settled; Pregel would still deliver that
            // message, so apply the min-pred tie-break directly (a pred
            // change never cascades: downstream tie-breaks compare this
            // vertex's id, which is unchanged)
            case Some((kd, kp)) => if (d + w == kd && id < kp) dist(nxt) = (kd, id)
          }
        }
      } else if (better) {
        dist(id) = (d, pred) // equal-dist deterministic min-pred tie-break
      }
    }
    dist.toMap
  }

  private def smallEnough[V: ClassTag](g: Graph[V, Double], threshold: Long): Boolean =
    g.edges.count() <= threshold

  /** DataFrame-level adaptive SSSP: `edges` must have (src, dst, w) columns.
    * Small edge sets are collected and solved driver-local without ever
    * constructing a GraphX graph (saves the RDD conversion + partitioning
    * jobs); large ones build the distributed graph and run delta-stepping.
    * Seq-returning convenience over [[ssspFrameFromEdges]] — ONE dispatch
    * implementation, not two to keep in sync. */
  def ssspFromEdges(edges: org.apache.spark.sql.DataFrame, source: VertexId,
      threshold: Long = DefaultLocalThreshold): Seq[(VertexId, Double)] =
    ssspFrameFromEdges(edges, source, threshold).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** DataFrame-returning adaptive SSSP — the result STAYS distributed on
    * the large branch: the distance table is a DataFrame over the SSSP
    * vertex RDD, never a driver-side Seq (at full scale the reachable set
    * is itself a big table; callers sort/limit/join it like any other).
    * Columns: (id long, dist double). */
  def ssspFrameFromEdges(edges: org.apache.spark.sql.DataFrame, source: VertexId,
      threshold: Long = DefaultLocalThreshold): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = edges.sparkSession
    val norm = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("double"))
    // limit-COUNT probe: one cheap job decides the dispatch without ever
    // shipping edge rows to the driver — the distributed branch previously
    // collected up to threshold+1 rows (~50 MB at the default) only to
    // discard them; now rows are collected on the local branch alone,
    // where the probe count has already bounded them to ≤ threshold
    val probeCount = norm.limit((threshold + 1).toInt).count()
    if (probeCount <= threshold) {
      val rows = localSssp(
        norm.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))), source)
        .map { case (id, (d, _)) => (id, d) }.toSeq
      spark.createDataFrame(rows).toDF("id", "dist")
    } else {
      val g = Graph.fromEdges(
        norm.rdd.map(r => org.apache.spark.graphx.Edge(r.getLong(0), r.getLong(1), r.getDouble(2))),
        0L)
      val verts = deltaSssp(g, source).vertices
        .filter { case (_, (d, _)) => !d.isInfinite }
        .map { case (id, (d, _)) => (id, d) }
      spark.createDataFrame(verts).toDF("id", "dist")
    }
  }

  /** Distances via the delta-stepping engine — the default distributed
    * path, justified by its own benchmark (GRAPHBENCH_r04 + the r06
    * repeat-pair study; 400k vertices, same-JVM pairs only, the default
    * Δ = 32×mean, every timed run equality-checked). The honest picture
    * across 5 paired runs per shape (`GRAPHBENCH_r06.json
    * repeat_pairs_x32`): delta wins the low-diameter expander outright
    * (6.6 s vs 12.6 s in the r06 sweep) and wins the wide-weight shape
    * in 4 of 5 pairs (delta stable at 12.5–15.1 s; Pregel spans
    * 12.2–22.0 s). On the moderate-diameter sparse shape Pregel holds a
    * ~13% median edge (≈48 s vs ≈56 s, 4/5 pairs) but carries an
    * unbounded tail — its r04 run hit 134.4 s, 2.4× the delta band,
    * and its cross-sweep history spans 41–134 s while delta stays in a
    * narrow 52–70 s band. Delta-stepping stays the default: two outright
    * wins plus bounded worst-case on the third beats a one-shape median
    * edge bought with tail risk. [[distances]]/[[sssp]] remain as the
    * label-correcting reference the equality specs compare against. */
  def deltaDistances[V: ClassTag](g: Graph[V, Double], source: VertexId): Seq[(VertexId, Double)] =
    deltaSssp(g, source).vertices
      .filter { case (_, (d, _)) => !d.isInfinite }
      .map { case (id, (d, _)) => (id, d) }
      .collect()
      .toSeq

  /** Distances with local-vs-distributed dispatch. */
  def autoDistances[V: ClassTag](
      g: Graph[V, Double], source: VertexId,
      threshold: Long = DefaultLocalThreshold): Seq[(VertexId, Double)] =
    if (smallEnough(g, threshold))
      localSssp(g.edges.collect().map(e => (e.srcId, e.dstId, e.attr)), source)
        .map { case (id, (d, _)) => (id, d) }.toSeq
    else deltaDistances(g, source)

  /** Single-pair path with local-vs-Pregel dispatch. */
  def autoPath[V: ClassTag](
      g: Graph[V, Double], source: VertexId, target: VertexId,
      threshold: Long = DefaultLocalThreshold): Option[(Double, Seq[VertexId])] =
    if (smallEnough(g, threshold)) {
      val state = localSssp(g.edges.collect().map(e => (e.srcId, e.dstId, e.attr)), source)
      state.get(target).map { case (d, _) =>
        var ids = List(target)
        while (ids.head != source) ids = state(ids.head)._2 :: ids
        (d, ids)
      }
      // large graphs: never collect the reachable vertex set to the driver —
      // walk predecessors distributively (O(pathLen) small lookup jobs)
    } else reconstructDistributed(g, source, target)

  /** 100 TB-safe path reconstruction: no driver-side vertex map; walks
    * predecessor pointers with one small lookup join per hop against the
    * (cached) SSSP vertex RDD. Hop count bounds the number of jobs. */
  def reconstructDistributed[V: ClassTag](
      g: Graph[V, Double], source: VertexId, target: VertexId,
      maxHops: Int = 10000): Option[(Double, Seq[VertexId])] = {
    val verts = deltaSssp(g, source).vertices.cache()
    // VertexRDD is hash-partitioned: lookup() probes the single owning
    // partition — O(V/p) per hop, not a full-RDD filter scan
    def lookup(id: VertexId): Option[State] =
      verts.lookup(id).headOption
    try {
      lookup(target).filter(!_._1.isInfinite).map { case (dist, _) =>
        var ids = List(target)
        var hops = 0
        while (ids.head != source && hops < maxHops) {
          ids = lookup(ids.head).get._2 :: ids
          hops += 1
        }
        require(ids.head == source,
          s"path reconstruction exceeded maxHops=$maxHops before reaching $source")
        (dist, ids)
      }
    } finally verts.unpersist(blocking = false)
  }
}
