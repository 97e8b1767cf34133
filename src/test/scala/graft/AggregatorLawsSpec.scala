package graft

import graft.functions.{BottomK, TopK}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bounded typed aggregators: Spark may split the
  * input into arbitrary partitions and merge partials in any grouping, so
  * the buffers must behave like a commutative monoid up to the k-bound —
  * any partitioning must yield exactly sort-take-k of the whole input. */
class AggregatorLawsSpec extends AnyFunSuite {

  private val topK = TopK(5)
  private val botK = BottomK(5)

  private def viaPartitions[T, B](xs: List[T], cut: Int, zero: B,
      reduce: (B, T) => B, merge: (B, B) => B): B =
    xs.grouped(math.max(1, cut)).toList
      .map(part => part.foldLeft(zero)(reduce))
      .foldLeft(zero)(merge)

  test("TopK: any partitioning equals global sort-take-k (100 random streams)") {
    val rng = new scala.util.Random(3)
    for (_ <- 0 until 100) {
      val xs = List.fill(rng.nextInt(40))((rng.nextDouble() * 200 - 100, rng.nextLong(50)))
      val cut = 1 + rng.nextInt(7)
      val got = topK.finish(viaPartitions(xs, cut, topK.zero, topK.reduce, topK.merge))
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(5)
      assert(got === want, s"xs=$xs cut=$cut")
    }
  }

  test("BottomK: any partitioning equals global sorted-take-k (exact 64-bit order)") {
    val rng = new scala.util.Random(4)
    for (_ <- 0 until 100) {
      val xs = List.fill(rng.nextInt(40))((rng.nextLong(), rng.nextLong(50)))
      val cut = 1 + rng.nextInt(7)
      val got = botK.finish(viaPartitions(xs, cut, botK.zero, botK.reduce, botK.merge))
      val want = xs.sorted.take(5)
      assert(got === want, s"xs=$xs cut=$cut")
    }
  }

  test("BudgetBottom: any partitioning equals global budget prefix (200 random streams)") {
    val agg = graft.functions.BudgetBottom(25)
    def want(xs: List[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
      var cum = 0L
      xs.sortBy(e => (e._1, e._2)).iterator
        .map { e => cum += e._3; (e, cum) }
        .takeWhile(_._2 <= 25L).map(_._1).toSeq
    }
    val rng = new scala.util.Random(6)
    for (_ <- 0 until 200) {
      val xs = List.fill(rng.nextInt(30))(
        (rng.nextLong(40), rng.nextLong(50), 1L + rng.nextLong(10)))
      val cut = 1 + rng.nextInt(7)
      val got = agg.finish(viaPartitions(xs, cut, agg.zero, agg.reduce, agg.merge))
      assert(got === want(xs), s"xs=$xs cut=$cut")
    }
  }

  test("BudgetBottom: dropped-weight regression — the barrier must ride along in partials") {
    // budget 10; one partition holds weights 6,6 (keys 1,2), another the
    // key-0 weight-3 element and a trailing key-3 weight-1 element. If the
    // overflowing key-2 element were dropped instead of kept as a barrier,
    // the merge would compute 3+6+1 ≤ 10 for key 3 and wrongly admit it
    // (its true prefix sum is 16).
    val agg = graft.functions.BudgetBottom(10)
    val pA = List((1L, 1L, 6L), (2L, 2L, 6L)).foldLeft(agg.zero)(agg.reduce)
    val pB = List((0L, 0L, 3L), (3L, 3L, 1L)).foldLeft(agg.zero)(agg.reduce)
    val got = agg.finish(agg.merge(pA, pB))
    assert(got === Seq((0L, 0L, 3L), (1L, 1L, 6L)))
  }

  test("Misra-Gries: frequent keys survive any partitioning/merge order") {
    val agg = graft.functions.MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), capacity = 8)
    val rng = new scala.util.Random(5)
    val letters = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    for (_ <- 0 until 50) {
      val noise = List.fill(200)(letters(rng.nextInt(letters.size)))
      val heavy = List.fill(60)("HEAVY") // 60 > 260/8 = N/k → guaranteed kept
      val stream = rng.shuffle(noise ++ heavy)
      val cut = 1 + rng.nextInt(50)
      // per-partition buffers built with the update() decrement semantics
      def toBuf(part: List[String]) = {
        val b = agg.createAggregationBuffer()
        part.foreach { k =>
          b.get(k) match {
            case Some(c) => b.update(k, c + 1L)
            case None if b.size < 8 => b.update(k, 1L)
            case None =>
              b.mapValuesInPlace((_, c) => c - 1L)
              b.filterInPlace((_, c) => c > 0L)
          }
        }
        b
      }
      val merged = stream.grouped(math.max(1, cut)).toList
        .map(toBuf)
        .reduceLeft((a, b) => agg.merge(a, b))
      assert(merged.contains("HEAVY"), s"cut=$cut")
      assert(merged.size <= 8)
    }
  }

  test("KmvSketch: any partitioning equals the global k-smallest-distinct sketch") {
    val kmv = graft.functions.KmvSketch(16)
    val rng = new scala.util.Random(6)
    for (_ <- 0 until 100) {
      // duplicates on purpose: KMV is over the distinct set
      val xs = List.fill(rng.nextInt(80))(rng.nextLong(40).abs)
      val cut = 1 + rng.nextInt(9)
      val buf = viaPartitions(xs, cut, kmv.zero, kmv.reduce, kmv.merge)
      assert(buf === xs.distinct.sorted.take(16), s"cut=$cut")
      val want = graft.functions.KmvSketch.estimate(xs.distinct.sorted.take(16), 16)
      assert(kmv.finish(buf) === want)
      if (xs.distinct.size < 16) assert(kmv.finish(buf) === xs.distinct.size.toLong)
    }
  }
}
