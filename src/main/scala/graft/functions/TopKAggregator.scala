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
