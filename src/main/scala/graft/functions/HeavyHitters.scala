package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitter summary as a native
  * `TypedImperativeAggregate` — the Catalyst surface for aggregates whose
  * state is an opaque mutable object rather than a fixed-width row (the
  * typed `Aggregator` used by TopK covers the encoder-friendly case; this
  * covers the binary-buffer case sketches need).
  *
  * Guarantees (k = capacity, N = stream length):
  *   - estimate ∈ [true − N/k, true] per tracked key;
  *   - every key with true frequency > N/k is present in the summary —
  *     the 100%-recall property the two-pass exact heavy-hitter query
  *     (TextOps q53) relies on: sketch candidates in one pass, recount
  *     candidates exactly in a second.
  *
  * Merge is the mergeable-summaries construction (Agarwal et al., PODS'12):
  * sum counters pairwise, then subtract the (k+1)-th largest counter and
  * drop non-positive entries — error adds across merges but stays ≤ N/k
  * total, so the recall property survives partial aggregation (map-side
  * partials + final merge, exactly how Spark executes it).
  *
  * Update cost is amortized O(1): a decrement pass costs O(k) but consumes
  * k units of accumulated count, so N updates do ≤ N/k passes.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    /** emit (key, residual-count) pairs instead of the bare key array —
      * the mergeable form a streaming accumulator persists between
      * micro-batches (counts are what [[merge]] needs; the batch q53
      * two-pass plan only needs the candidate keys) */
    emitCounts: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None => // full: decrement all, drop zeros (amortized O(1))
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (k+1)-th largest counter, keep positives (≤ k of them)
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = buf.collect { case (k, c) if c - cut <= 0L => k }.toSeq
      buf.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Candidate keys sorted for determinism — or (key, residual-count)
    * structs when [[emitCounts]] is set. */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    if (emitCounts)
      new GenericArrayData(buf.toArray.sortBy(_._1).map { case (k, c) =>
        InternalRow(UTF8String.fromString(k), c).asInstanceOf[Any]
      })
    else
      new GenericArrayData(buf.keys.toArray.sorted.map(UTF8String.fromString): Array[Any])

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitCounts) ArrayType(HeavyHitters.PairType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "misra_gries_candidates"
}

object HeavyHitters {
  /** Shape of one summary entry in [[summary]] output. */
  val PairType: StructType = StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("c", LongType, nullable = false)))

  /** Aggregate a string column into the ≤ k Misra-Gries candidate keys
    * (array<string>) — every value with frequency > N/k is guaranteed
    * present. */
  def candidates(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Aggregate to the raw summary (array<struct<k,c>>) — the mergeable
    * state a streaming accumulator persists between micro-batches. */
  def summary(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k, emitCounts = true)
        .toAggregateExpression())
}
