package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group bottom-k aggregator — the PARTIAL-AGGREGATION
  * top-k shape that several query scaladocs (q91, q3's TakeOrdered)
  * name as the corpus-scale alternative to a per-group sort window:
  * every task keeps at most k rows per group in its hash map, the
  * exchange carries ≤ k·groups rows, and merge is an O(k) sorted
  * take. A window, by contrast, shuffles EVERY row to its group's
  * partition before ranking — same answer, corpus-sized exchange.
  *
  * Elements are (sortKey, payload) pairs ordered lexicographically —
  * exactly q91's (md5(id), id) hash-rank order, so the q106 battery
  * query is the aggregator twin of q91's window and shares its
  * oracle. Buffers ride the Kryo encoder (opaque to codegen — the
  * plan's win is the shuffle volume, not the agg's instruction
  * count; the executed plan shows ObjectHashAggregate with a partial
  * stage, asserted in PlanSpec).
  */
final class BottomK(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)],
      List[(String, Long)]] {
  require(k >= 1, "k must be >= 1")

  override def zero: List[(String, Long)] = Nil

  override def reduce(buf: List[(String, Long)],
      a: (String, Long)): List[(String, Long)] =
    // sorted insert + take: buf stays ≤ k, so this is O(k) per row
    (a :: buf).sorted.take(k)

  override def merge(x: List[(String, Long)],
      y: List[(String, Long)]): List[(String, Long)] =
    (x ++ y).sorted.take(k)

  override def finish(r: List[(String, Long)]): List[(String, Long)] =
    r.sorted

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    Encoders.kryo[List[(String, Long)]]

  override def outputEncoder: Encoder[List[(String, Long)]] =
    Encoders.kryo[List[(String, Long)]]
}
