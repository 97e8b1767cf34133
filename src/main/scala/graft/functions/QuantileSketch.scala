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
  * percentiles. The buffer is a SET of (hash, value) pairs: duplicated
  * VALUES keep their multiplicity (different rows hash apart — the
  * crucial difference from feeding values through KMV), while a
  * re-presented ROW is a no-op, making the sketch idempotent as well as
  * mergeable (what lets QuantileStream fold state under replays; two
  * genuinely distinct rows colliding on the full (hash, value) pair is a
  * 2⁻⁶³ event, the same caveat KMV carries).
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
    /** emit the raw (hash, value) pairs instead of the sorted values —
      * the mergeable form a streaming monitor persists between batches */
    emitPairs: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Double)]] {

  require(k > 0, "sample size must be positive")

  private implicit val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  // a k-bounded sorted SET, not a multiset heap: the hash is the row's
  // identity, so "k smallest DISTINCT (hash, value) pairs" makes the
  // buffer an idempotent semilattice — re-merging rows already sampled
  // (a replayed micro-batch, overlapping state unions) is a no-op, which
  // is what lets QuantileStream fold state without exactly-once inputs.
  // (QuantileStreamSpec's replay test caught the multiset version
  // double-counting re-presented pairs and evicting the real tail.)
  // Distinct VALUES keep their multiplicity — different rows hash apart —
  // so rank statistics are still over the row multiset.
  override def createAggregationBuffer(): mutable.TreeSet[(Long, Double)] =
    mutable.TreeSet.empty[(Long, Double)]

  private def add(buf: mutable.TreeSet[(Long, Double)], pair: (Long, Double)): Unit =
    if (buf.size < k) buf += pair
    else if (ord.lt(pair, buf.last) && !buf.contains(pair)) {
      buf -= buf.last; buf += pair
    }

  override def update(
      buf: mutable.TreeSet[(Long, Double)],
      input: InternalRow): mutable.TreeSet[(Long, Double)] = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null)
      add(buf, (kv.asInstanceOf[Long], vv.asInstanceOf[Double]))
    buf
  }

  override def merge(
      buf: mutable.TreeSet[(Long, Double)],
      other: mutable.TreeSet[(Long, Double)]): mutable.TreeSet[(Long, Double)] = {
    other.foreach(add(buf, _))
    buf
  }

  /** Sample values sorted ascending (quantile-ready), or the (hash,
    * value) pairs sorted by key when [[emitPairs]] is set. */
  override def eval(buf: mutable.TreeSet[(Long, Double)]): Any =
    if (emitPairs)
      new GenericArrayData(buf.toArray.map { case (h, v) =>
        InternalRow(h, v).asInstanceOf[Any]
      })
    else
      new GenericArrayData(buf.toArray.map(_._2)
        .sorted(Ordering.Double.TotalOrdering).map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.TreeSet[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitPairs) ArrayType(QuantileSketch.PairType, containsNull = false)
    else ArrayType(DoubleType, containsNull = false)
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

  /** Shape of one retained sample pair in [[samplePairs]] output. */
  val PairType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v", DoubleType, nullable = false)))

  /** Aggregate to the sketch sample: ascending array<double> of the k
    * hash-selected values. */
  def sample(key: Column, value: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(key),
        ColumnBridge.expression(value), k).toAggregateExpression())

  /** Aggregate to the raw mergeable sample: array<struct<h,v>> sorted by
    * (h, v) — the state a streaming accumulator persists and re-feeds
    * through this same aggregate on the next batch. */
  def samplePairs(key: Column, value: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(key),
        ColumnBridge.expression(value), k, emitPairs = true).toAggregateExpression())

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
