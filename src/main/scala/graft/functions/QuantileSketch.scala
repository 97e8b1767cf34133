package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Mergeable quantile sketch as a native `TypedImperativeAggregate` — the
  * KMV construction applied to rank statistics: keep the k input rows whose
  * (hash, value) key is smallest, i.e. a bottom-k-by-hash uniform row
  * sample, and read quantiles off the sample with linear interpolation.
  *
  * Why this construction and not KLL/t-digest: those sketches tighten the
  * rank-error constant (O(1/k) vs O(1/√k) here) but pay for it with
  * *randomized compaction* (KLL's coin flips) or *merge-order-dependent
  * state* (t-digest's centroids) — so two runs of the same query, or the
  * same run under a different partitioning, return different estimates,
  * and no external engine can reproduce the number. This sketch is a
  * deterministic function of the input SET: reduce and merge both keep
  * "the k smallest (hash, value) pairs", a commutative idempotent monoid
  * bound (the BottomK/KMV law), so ANY partitioning and merge tree yields
  * byte-identical state (AggregatorLawsSpec), and a DuckDB oracle can
  * recompute the estimate exactly (q76) — the same determinism-over-
  * constant-factor trade [[KmvSketch]] makes for distinct counts.
  *
  * Rank error: the sample is uniform over rows (hashes are uniform and
  * row-unique), so a q-quantile of the sample deviates from the true
  * q-quantile by rank ≈ √(q(1−q)/k) · n w.h.p. (≈2–3% of n at k = 256) —
  * QuantileSketchSpec gates the estimate against the exact q41
  * percentiles. Hash ties are broken by value so the bound is on the
  * multiset, not the distinct set: duplicated values keep their
  * multiplicity in the sample, which rank statistics require (the crucial
  * difference from feeding values through KMV).
  *
  * Scale shape: O(k) state per group, map-side partial aggregation ships
  * ≤ k (hash, value) pairs per partition, merges are k-bounded — the
  * HeavyHitters/[[KmvSketch]] mergeable-summaries mold (Agarwal et al.,
  * PODS'12). Update cost after saturation is one comparison against the
  * current cap (a max-heap root).
  *
  * Input: `key` — a 63-bit row-unique hash (e.g. [[HashFamily.hash63]] of
  * the row's primary key, so the oracle can reproduce the sample); `value`
  * — the measured double. Output: the sample's values sorted ascending
  * (array<double>); quantile interpolation happens in the query via
  * [[QuantileSketch.interpolate]] so one sketch serves many quantiles.
  */
case class QuantileSketchAgg(
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]] {

  require(k > 0, "sample size must be positive")

  // max-heap on (hash, value): the root is the current cap — the pair that
  // leaves first when a smaller one arrives
  private implicit val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Double)]

  override def update(
      buf: mutable.PriorityQueue[(Long, Double)],
      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null) {
      val pair = (kv.asInstanceOf[Long], vv.asInstanceOf[Double])
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Double)],
      other: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    other.foreach { pair =>
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  /** Sample values sorted ascending — the quantile-ready form. */
  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any =
    new GenericArrayData(buf.toArray.map(_._2)
      .sorted(Ordering.Double.TotalOrdering).map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def children: Seq[Expression] = Seq(key, value)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "quantile_sketch_sample"
}

object QuantileSketch {

  /** Default sample size: rank error ≈ √(q(1−q)/k) ≈ 3% of n at the
    * median. */
  val DefaultK = 256

  /** Aggregate to the sketch sample: ascending array<double> of the k
    * hash-selected values. */
  def sample(key: Column, value: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(key),
        ColumnBridge.expression(value), k).toAggregateExpression())

  /** Linear-interpolation quantile over a sorted sample column (the
    * percentile_cont definition): pos = q·(n−1); v = v⌊pos⌋ +
    * (v⌊pos⌋₊₁ − v⌊pos⌋)·frac. Pure IEEE arithmetic — one multiply, one
    * subtract, one multiply-add on identical doubles — so the oracle SQL
    * written in the same shape reproduces it bit-for-bit (no
    * transcendentals anywhere). */
  def interpolate(sorted: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    val pos = lit(q) * (size(sorted) - 1).cast("double")
    val lo = floor(pos).cast("int")
    val vlo = element_at(sorted, lo + 1)
    val vhi = element_at(sorted, least(lo + 2, size(sorted)))
    vlo + (vhi - vlo) * (pos - floor(pos))
  }
}
