package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored item entering the top-K aggregation. */
case class Scored(key: String, item: String, score: Double)

/** Typed top-K-by-score Aggregator (SURVEY.md §7.3): a bounded min-heap
  * per group, merged associatively — the partial-aggregation-friendly
  * form of "sort the group and take K". Each partition keeps at most K
  * elements per key (map-side combine), so the shuffle carries K rows
  * per key instead of the whole group — the property that makes group-wise
  * top-K viable when a hot key has millions of rows.
  *
  * Ordering: score descending, item ascending as the deterministic
  * tie-break (same contract as the windowed row_number variants).
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, mutable.PriorityQueue[(Double, String)], Seq[String]] {

  /** PriorityQueue dequeues its greatest element; "greatest" here means
    * worst-ranked (lowest score, then largest item), so eviction always
    * drops the element that top-K ordering would cut first. */
  private val evictionOrder: Ordering[(Double, String)] =
    new Ordering[(Double, String)] {
      def compare(a: (Double, String), b: (Double, String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  override def zero: mutable.PriorityQueue[(Double, String)] =
    mutable.PriorityQueue.empty(evictionOrder)

  private def add(b: mutable.PriorityQueue[(Double, String)],
      e: (Double, String)): mutable.PriorityQueue[(Double, String)] = {
    b.enqueue(e)
    while (b.size > k) b.dequeue()
    b
  }

  override def reduce(b: mutable.PriorityQueue[(Double, String)],
      a: Scored): mutable.PriorityQueue[(Double, String)] =
    add(b, (a.score, a.item))

  override def merge(b1: mutable.PriorityQueue[(Double, String)],
      b2: mutable.PriorityQueue[(Double, String)]): mutable.PriorityQueue[(Double, String)] = {
    b2.foreach(e => add(b1, e))
    b1
  }

  override def finish(b: mutable.PriorityQueue[(Double, String)]): Seq[String] =
    b.toSeq.sortBy { case (s, i) => (-s, i) }.map(_._2)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, String)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, String)]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object TopK {
  /** Group-wise top-K item lists, typed API. */
  def topKPerKey(ds: Dataset[Scored], k: Int): Dataset[(String, Seq[String])] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key).agg(new TopKAggregator(k).toColumn.name("top"))
  }
}
