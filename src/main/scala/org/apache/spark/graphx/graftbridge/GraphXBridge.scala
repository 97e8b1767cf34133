package org.apache.spark.graphx.graftbridge

import org.apache.spark.graphx._
import org.apache.spark.graphx.impl.GraphImpl

import scala.reflect.ClassTag

/** Bridge into GraphX's `private[graphx]` message-aggregation API.
  *
  * `Graph.aggregateMessages` always scans EVERY edge partition; the
  * active-set variant (what `Pregel` itself runs on) restricts the scan to
  * edges incident to a given vertex set, using the per-partition vertex
  * index. For frontier-style algorithms (SSSP, delta-stepping buckets)
  * where each superstep touches a small moving frontier, this is the
  * difference between O(frontier-incident edges) and O(|E|) work per
  * superstep — exactly the optimization Pregel's label-correcting loop
  * gets for free and a hand-rolled bucket loop otherwise loses.
  */
object GraphXBridge {

  /** `aggregateMessages` restricted to edges whose `direction`-side vertex
    * is in `active` (e.g. `EdgeDirection.Out` = scan only out-edges of
    * active vertices). `active` must be co-partitioned with the graph's
    * vertices — any VertexRDD derived from the same graph (messages from a
    * prior round, a `vertices.filter`) qualifies. */
  def aggregateMessagesWithActiveSet[VD: ClassTag, ED: ClassTag, A: ClassTag](
      g: Graph[VD, ED],
      sendMsg: EdgeContext[VD, ED, A] => Unit,
      mergeMsg: (A, A) => A,
      tripletFields: TripletFields,
      active: VertexRDD[_],
      direction: EdgeDirection): VertexRDD[A] =
    g.asInstanceOf[GraphImpl[VD, ED]]
      .aggregateMessagesWithActiveSet(sendMsg, mergeMsg, tripletFields,
        Some((active, direction)))
}
