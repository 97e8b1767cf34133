package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS'16) as a
  * `TypedImperativeAggregate` — the tighter-error companion to the
  * oracle-able [[QuantileSketchAgg]]: rank error O(1/k) at O(k) space
  * versus the hash-sample's O(1/√k), at the price of NOT being
  * reproducible from outside the engine. Compaction drops every other
  * element of a sorted level (survivor parity alternates via a counter,
  * so a single-threaded run is deterministic, but the survivor set still
  * depends on which elements shared a level — i.e. on partitioning and
  * merge order). That is exactly why this sketch has no DuckDB-oracled
  * registry entry: q76 remains the exactly-checkable quantile surface,
  * and KllSketchSpec gates this one on (a) rank-error bounds against the
  * exact q41 percentiles and (b) error stability across partitionings —
  * the strongest guarantees the construction itself offers.
  *
  * Implementation shape (the DataSketches simplification): a stack of
  * levels, level h holding items of weight 2^h; level capacities decay
  * geometrically (ratio 2/3) from k at the top, so total space is ~3k/…
  * bounded regardless of stream length; an over-capacity level is
  * sorted and halved upward. Merge concatenates level-wise and
  * re-compacts — error adds linearly in compactions, preserving the
  * O(1/k) bound under partial aggregation (the mergeable-summaries
  * property Spark's map-side combine requires).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  require(k >= 8, "k must be at least 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KllState): Any =
    new GenericArrayData(probs.map(p => buf.quantile(p).asInstanceOf[Any]).toArray)

  override def serialize(buf: KllState): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): KllState = KllState.fromBytes(bytes)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kll_quantiles"
}

/** Mutable KLL state: `levels(h)` holds items of weight 2^h. */
final class KllState(val k: Int) {
  private[functions] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  private[functions] var count: Long = 0L
  private[functions] var flips: Long = 0L // alternating compaction parity

  /** Exact number of items folded in (weights always sum back to this). */
  def n: Long = count

  private def cap(h: Int): Int = {
    // geometric decay k, 2k/3, 4k/9, … from the TOP level downward
    val depthFromTop = levels.length - 1 - h
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depthFromTop)).toInt)
  }

  private def totalSize: Int = levels.map(_.length).sum
  private def totalCap: Int = levels.indices.map(cap).sum

  def insert(v: Double): Unit = {
    levels(0) += v
    count += 1L
    if (totalSize > totalCap) compress()
  }

  /** Sort the lowest over-capacity level and promote every other item. */
  private def compress(): Unit = {
    val h = levels.indices.find(i => levels(i).length >= cap(i)).getOrElse(0)
    val sorted = levels(h).sorted(Ordering.Double.TotalOrdering)
    val offset = (flips & 1L).toInt
    flips += 1L
    if (h + 1 == levels.length) levels += ArrayBuffer.empty[Double]
    var i = offset
    while (i < sorted.length) { levels(h + 1) += sorted(i); i += 2 }
    // the non-survivors are dropped; odd-length remainders are covered by
    // the alternating offset in expectation (the standard KLL accounting)
    levels(h).clear()
  }

  def mergeIn(other: KllState): Unit = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    other.levels.indices.foreach(h => levels(h) ++= other.levels(h))
    count += other.count
    flips += other.flips
    var guard = 0
    while (totalSize > totalCap && guard < 64) { compress(); guard += 1 }
  }

  /** Weighted-rank quantile: smallest value whose cumulative weight
    * reaches q·N over the (value, 2^h) summary. */
  def quantile(q: Double): Double = {
    if (count == 0L) return Double.NaN
    val pairs = ArrayBuffer.empty[(Double, Long)]
    levels.indices.foreach { h =>
      val w = 1L << h
      levels(h).foreach(v => pairs += ((v, w)))
    }
    val sorted = pairs.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * totalW).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(count); out.writeLong(flips)
    out.writeInt(levels.length)
    levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush(); bos.toByteArray
  }
}

object KllState {
  def fromBytes(bytes: Array[Byte]): KllState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new KllState(in.readInt())
    st.count = in.readLong(); st.flips = in.readLong()
    val nLevels = in.readInt()
    st.levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Double])
    st.levels.foreach { lvl =>
      val n = in.readInt()
      var i = 0
      while (i < n) { lvl += in.readDouble(); i += 1 }
    }
    st
  }
}

/** [[KllSketchAgg]] emitting the SERIALIZED state instead of quantile
  * estimates — the unit a streaming monitor persists and re-merges
  * ([[graft.streaming.KllStream]]): the distributed aggregation builds
  * one state per group, the monitor folds it into the stored state with
  * the same `mergeIn` the map-side combine uses. */
case class KllStateAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  require(k >= 8, "k must be at least 8")

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KllState): Any = buf.toBytes

  override def serialize(buf: KllState): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllState = KllState.fromBytes(bytes)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kll_state"
}

object KllSketch {
  val DefaultK = 200

  /** Aggregate a double column into KLL quantile estimates at `probs`. */
  def quantiles(c: Column, probs: Seq[Double], k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(c), k, probs).toAggregateExpression())

  /** Aggregate a double column into ONE serialized KLL state. */
  def state(c: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllStateAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
