package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (score DESC, id ASC) as a typed Aggregator.
  *
  * The scale property WindowExec lacks: a window top-k SORTS every cell
  * in full (O(m log m) per cell, all m rows shuffled); this aggregator
  * keeps a k-bounded buffer, so map-side partial aggregation ships at
  * most k candidates per group per partition and merge cost is
  * O(k). That is the plan shape that survives cells of millions of
  * vectors. Deterministic: ties break on ascending id (and exact
  * duplicates of (score, id) are kept bounded, not deduped). */
class TopKByScore[I](k: Int, idScore: I => (Long, Double))
  extends Aggregator[I, Seq[(Long, Double)], Seq[(Long, Double)]] {

  // (id, score); ordered best-first. Double.compare, NOT >: Spark's
  // sort order (and the window top-k this replaces) ranks NaN above
  // every double and -0.0 below 0.0 — strict > would silently demote
  // NaN scores (e.g. 0/0 cosines of zero-norm vectors) to the bottom
  // and diverge from the oracle.
  private def lt(a: (Long, Double), b: (Long, Double)): Boolean = {
    val c = java.lang.Double.compare(a._2, b._2)
    c > 0 || (c == 0 && a._1 < b._1)
  }

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], in: I): Seq[(Long, Double)] = {
    val x = idScore(in)
    if (buf.length >= k && !lt(x, buf.last)) buf
    else {
      val i = buf.indexWhere(e => lt(x, e))
      val at = if (i < 0) buf.length else i
      (buf.take(at) :+ x) ++ buf.drop(at) match {
        case s if s.length > k => s.take(k)
        case s => s
      }
    }
  }

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] = {
    // both inputs sorted best-first and <= k long: linear merge, cut at k
    val out = Vector.newBuilder[(Long, Double)]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && lt(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
