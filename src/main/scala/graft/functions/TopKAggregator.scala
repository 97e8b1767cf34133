package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k as a typed [[Aggregator]] (SURVEY §2.10 — the
  * user-facing custom-aggregate surface). The buffer never exceeds k
  * entries, so partial aggregation ships O(k) per partition instead of the
  * whole group — the map-side-combine property that makes per-group top-k
  * scale without a full window sort.
  *
  * Entries are (score, id); ordering is score desc with id asc tie-break,
  * matching a ROW_NUMBER() OVER (ORDER BY score DESC, id) oracle.
  */
final case class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def best(a: Seq[(Double, Long)]): Seq[(Double, Long)] =
    a.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    best(b :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = best(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Exact bounded bottom-k over (key, id) longs, ascending lexicographic —
  * the sampling-side sibling of [[TopK]]: exact 64-bit ordering (a double
  * score would lose precision on 63-bit hash keys), O(k) buffers, so a
  * per-stratum quota sample is a partial aggregate instead of a full
  * window sort of each stratum. */
/** Exact bounded budget-prefix over (key, id, weight) longs: the admitted
  * set is the ascending-(key, id) prefix whose RUNNING weight sum stays
  * ≤ budget — the token-budget mixture-sampling primitive (q81), where the
  * quota is a weight total rather than a row count ([[BottomK]]'s case).
  *
  * Truncation soundness is subtler than [[BottomK]]'s: a partial buffer
  * keeps the maximal ascending prefix whose running sum stays ≤ budget
  * PLUS the first overflowing element (the "barrier"). The barrier's
  * subset running sum already exceeds the budget, and a global running
  * sum only grows (merging inserts elements before it, never removes),
  * so everything at-or-after the barrier is provably excluded and safe to
  * drop — but the barrier itself must be RETAINED in partials: dropping
  * it would lose its weight, and a later merge could then under-count
  * the running sum of elements sorting after it and wrongly re-admit
  * them (budget 10, one partition holding weights 6,6 and another the
  * weight-3 element that sorts first: with the second 6 dropped, a
  * trailing weight-1 element computes 3+6+1 ≤ 10 though its true prefix
  * sum is 16). Only [[finish]] cuts the barrier. With positive weights
  * the buffer never exceeds budget/min(weight)+1 entries, so partial
  * aggregation ships O(budget) per partition instead of window-sorting
  * every row of every group. */
final case class BudgetBottom(budget: Long)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]] {

  private def before(x: (Long, Long, Long), y: (Long, Long, Long)): Boolean =
    x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)

  /** Ascending prefix with running sum ≤ budget over an ALREADY-SORTED
    * iterator; `withBarrier` also keeps the first overflowing element. */
  private def prefixOf(sorted: Iterator[(Long, Long, Long)],
      withBarrier: Boolean): Seq[(Long, Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long, Long)]
    var cum = 0L
    var open = true
    while (open && sorted.hasNext) {
      val e = sorted.next()
      cum += e._3
      if (cum <= budget) out += e
      else { if (withBarrier) out += e; open = false }
    }
    out.result()
  }

  private def prefix(a: Seq[(Long, Long, Long)], withBarrier: Boolean): Seq[(Long, Long, Long)] =
    prefixOf(a.sortBy(e => (e._1, e._2)).iterator, withBarrier)

  override def zero: Seq[(Long, Long, Long)] = Seq.empty

  /** Per-row fold exploits the buffer invariant that every `prefix` output
    * is already sorted (prefix + optional trailing barrier), so no re-sort
    * is ever needed: an input sorting at-or-after the last element either
    * appends in O(1) (it is admitted, or becomes the barrier) or — when a
    * barrier is already present (running sum > budget) — is provably
    * excluded and dropped outright; only an input landing strictly inside
    * the buffer pays a linear merge-insert + prefix rescan. This keeps the
    * per-row cost O(B) worst / O(1)-ish on ordered data instead of the
    * O(B log B) full re-sort the first cut paid. */
  override def reduce(b: Seq[(Long, Long, Long)], in: (Long, Long, Long)): Seq[(Long, Long, Long)] =
    if (b.isEmpty) Seq(in)
    else if (!before(in, b.last)) {
      var cum = 0L
      b.foreach(cum += _._3)
      if (cum > budget) b // buffer ends in a barrier; `in` sorts at-or-after it
      else b :+ in // admitted (cum+w ≤ budget) or the new barrier — kept either way
    } else {
      val (pre, post) = b.span(before(_, in))
      prefixOf(pre.iterator ++ Iterator(in) ++ post.iterator, withBarrier = true)
    }

  override def merge(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    prefix(a ++ b, withBarrier = true)

  override def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    prefix(r, withBarrier = false)

  override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
}

final case class BottomK(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def best(a: Seq[(Long, Long)]): Seq[(Long, Long)] = a.sorted.take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(b: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    best(b :+ in)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    best(a ++ b)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = best(r)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
