package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact grouped top-k as a typed `Aggregator` — the §2.10 extension
  * tier between a scalar Expression (CosineSimilarity/NfcNormalize)
  * and a whole-operator plan (AsofJoin): a custom AGGREGATION
  * FUNCTION that plugs into Spark's ordinary partial/merge/final
  * aggregation machinery.
  *
  * Why not the window form (`row_number over (partition by g order
  * by v desc) <= k`)? The window SORTS every group in full — at
  * 100 TB that is a shuffle carrying EVERY row plus an O(n log n)
  * per-group sort, to keep k of them. This aggregator keeps a
  * k-bounded min-heap per group: map-side partials reduce each
  * partition's contribution to ≤ k rows BEFORE the exchange, so the
  * shuffle moves at most (#partitions × k) rows per group and the
  * sort is O(n log k). Same answer (ties broken by the tiebreak
  * column — total order, deterministic), structurally cheaper.
  *
  * Elements are (sortKey, tiebreak, payload): descending by sortKey,
  * ascending tiebreak — the exact order of the window twin
  * (`orderBy(desc(v), asc(id))`).
  */
object TopKAggregator {

  type Elem = (Double, Long, String)

  /** Bounded buffer: ordered ascending-by-(key, -tiebreak) so the
    * HEAD is the weakest element — drop it when over capacity.
    */
  private def insert(buf: List[Elem], e: Elem, k: Int): List[Elem] = {
    // ascending "badness": smaller key = weaker; on equal keys a
    // LARGER tiebreak is weaker (we keep the smallest ids)
    def weaker(a: Elem, b: Elem): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
    val (lo, hi) = buf.span(weaker(_, e))
    val grown = lo ::: (e :: hi)
    if (grown.length > k) grown.tail else grown
  }

  def topK(k: Int): Aggregator[Elem, List[Elem], Seq[Elem]] =
    new Aggregator[Elem, List[Elem], Seq[Elem]] {
      def zero: List[Elem] = Nil
      def reduce(b: List[Elem], e: Elem): List[Elem] = insert(b, e, k)
      def merge(a: List[Elem], b: List[Elem]): List[Elem] =
        b.foldLeft(a)(insert(_, _, k))
      def finish(r: List[Elem]): Seq[Elem] =
        // strongest first: descending key, ascending tiebreak
        r.reverse
      def bufferEncoder: Encoder[List[Elem]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      def outputEncoder: Encoder[Seq[Elem]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
