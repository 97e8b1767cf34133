package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k minimum values) distinct-count sketch as a typed [[Aggregator]] —
  * the approximate-cardinality surface (HyperLogLog's role) in a form whose
  * estimate is a *deterministic function of the hashed input*, so a DuckDB
  * oracle can reproduce it bit-for-bit: sort the distinct hashes, take the
  * k-th smallest, apply the estimator. HLL itself can't carry an exact
  * cross-engine oracle (register layouts are engine-specific), which is why
  * the registry skipped approx-distinct until now.
  *
  * Estimator (Bar-Yossef et al., RANDOM 2002): with hashes uniform in
  * [0, 2⁶³), the k-th smallest distinct hash h₍ₖ₎ estimates the distinct
  * count as (k−1) / (h₍ₖ₎ / 2⁶³); below k distinct values the sketch is the
  * exact set. Relative error ≈ 1/√(k−2) (~6% at k = 256).
  *
  * Scale shape: the buffer is a sorted distinct array capped at k, so
  * partial aggregation ships O(k) longs per partition and merges are
  * k-bounded unions — a mergeable sketch with map-side combine, the same
  * property that lets it run as a streaming accumulator. Once a partition's
  * buffer saturates, each further row costs one comparison against the cap
  * (the common case after the first k rows).
  */
final case class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Long] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], x: Long): Seq[Long] =
    if (b.length == k && x >= b.last) b // saturated and too large: O(1) reject
    else if (b.contains(x)) b
    else ((b :+ x).sorted: Seq[Long]).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    ((a ++ b).distinct.sorted: Seq[Long]).take(k)

  override def finish(r: Seq[Long]): Long = KmvSketch.estimate(r, k)

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
}

/** Null-SKIPPING boxed face of [[KmvSketch]] for the untyped `udaf(...)`
  * surface (Profile q73): SQL aggregates ignore NULL inputs — the oracle
  * counterpart filters `WHERE expr IS NOT NULL` — but a primitive-encoder
  * UDAF can't observe the null at all (the encoder would coerce it to 0,
  * silently counting a phantom distinct value). Boxing the input makes
  * the null visible so reduce can drop it; ProfileSpec pins the
  * null-bearing case. */
final case class KmvSketchBoxed(k: Int) extends Aggregator[java.lang.Long, Seq[Long], Long] {
  private val inner = KmvSketch(k)
  override def zero: Seq[Long] = inner.zero
  override def reduce(b: Seq[Long], x: java.lang.Long): Seq[Long] =
    if (x == null) b else inner.reduce(b, x.longValue)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = inner.merge(a, b)
  override def finish(r: Seq[Long]): Long = inner.finish(r)
  override def bufferEncoder: Encoder[Seq[Long]] = inner.bufferEncoder
  override def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
}

/** [[KmvSketch]] emitting the raw sketch buffer instead of the estimate —
  * the unit a streaming accumulator persists between micro-batches (union
  * of sketches = sketch of the union, so incremental maintenance is exact:
  * `streaming.VocabStream`). */
final case class KmvBuffer(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val inner = KmvSketch(k)
  override def zero: Seq[Long] = inner.zero
  override def reduce(b: Seq[Long], x: Long): Seq[Long] = inner.reduce(b, x)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = inner.merge(a, b)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] = inner.bufferEncoder
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {
  /** 2⁶³ — exactly representable as a double (power of two), so both
    * engines normalize hashes with the identical constant. */
  val HashSpace: Double = 9.223372036854775808e18

  /** Deterministic estimate from a sorted distinct sketch: exact below k;
    * (k−1)/(h₍ₖ₎/2⁶³) floored at k. Two IEEE divides + floor, evaluated in
    * the same order as the oracle SQL so the results are bit-identical. */
  def estimate(sketch: Seq[Long], k: Int): Long =
    if (sketch.length < k) sketch.length.toLong
    else math.floor((k - 1).toDouble / (sketch(k - 1).toDouble / HashSpace)).toLong
}
