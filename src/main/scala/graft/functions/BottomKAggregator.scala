package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact grouped bottom-k (k smallest by `(key, id)` ascending) as a
  * typed `Aggregator` — the skew-proof twin of [[TopKAggregator]] for
  * the per-domain cap operator (TextAnalysis.domainCap).
  *
  * Why this instead of `row_number() over (partition by domain order
  * by key)`? The window form shuffles EVERY row of a domain into one
  * partition and sorts it in full — a mega-domain (half the corpus
  * behind one source, a routine web-crawl shape) becomes one hot
  * partition that serializes the stage at 100 TB. This aggregator
  * keeps a k-bounded ordered buffer per group, so the map-side
  * partial reduces each partition's contribution to ≤ k rows BEFORE
  * the exchange: the shuffle moves at most (#partitions × k) rows per
  * domain no matter how large the domain is, and no full per-domain
  * sort ever happens. Same answer — the kept set and its ranks are
  * exactly the window twin's first k rows (total order via the id
  * tiebreak, deterministic).
  */
object BottomKAggregator {

  /** (orderKey, id): ascending by key, then ascending id. */
  type Elem = (Long, Long)

  private def lt(a: Elem, b: Elem): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Ordered ascending buffer; the LAST element is the weakest —
    * drop it when over capacity.
    */
  private def insert(buf: List[Elem], e: Elem, k: Int): List[Elem] = {
    val (lo, hi) = buf.span(lt(_, e))
    val grown = lo ::: (e :: hi)
    if (grown.length > k) grown.init else grown
  }

  def bottomK(k: Int): Aggregator[Elem, List[Elem], Seq[Elem]] =
    new Aggregator[Elem, List[Elem], Seq[Elem]] {
      def zero: List[Elem] = Nil
      def reduce(b: List[Elem], e: Elem): List[Elem] = insert(b, e, k)
      def merge(a: List[Elem], b: List[Elem]): List[Elem] =
        b.foldLeft(a)(insert(_, _, k))
      // already ascending = rank order: index i ⇒ rank i+1
      def finish(r: List[Elem]): Seq[Elem] = r
      def bufferEncoder: Encoder[List[Elem]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      def outputEncoder: Encoder[Seq[Elem]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
