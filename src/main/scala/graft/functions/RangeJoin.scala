package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — the inequality-join primitive Spark
  * lacks as a first-class operator. A join whose ONLY predicate is a
  * range condition (`l.point BETWEEN r.lo AND r.hi`) has no equi-key,
  * so Catalyst plans BroadcastNestedLoopJoin — O(|L|·|R|) comparisons
  * and, past the broadcast threshold, a full CartesianProduct. The
  * reference's host engine (DuckDB) ships a dedicated IEJoin for this
  * shape; on Spark the scalable re-expression is to MANUFACTURE an
  * equi-key: quantize the point axis into fixed-width buckets.
  *
  *  - each LEFT point belongs to exactly ONE bucket `floorDiv(p, w)`;
  *  - each RIGHT interval is replicated to EVERY bucket it overlaps
  *    (`sequence(floorDiv(lo, w), floorDiv(hi, w))` + explode);
  *  - the join becomes a plain equi-join on the bucket id (plus any
  *    caller equi-keys) with the exact range predicate as a residual
  *    filter.
  *
  * Each qualifying (left, right) pair meets in exactly one bucket — the
  * left point's — so the output needs NO dedup. Cost model at 100 TB:
  * one hash shuffle of L and of the replicated R; replication factor is
  * `avgIntervalLength / w + 1`, so pick `w` near the typical interval
  * length (factor ≈ 2). Skew concentrates in hot buckets exactly like
  * any equi-join key — AQE skew-join splitting applies as-is, and a
  * small interval side collapses to a broadcast hash join under AQE.
  * This is the plan shape DuckDB's IEJoin competes with; unlike BNLJ
  * it never materializes the |L|·|R| comparison space.
  *
  * Bounds are INCLUSIVE on both ends; encode an exclusive bound on an
  * integral axis by pre-adjusting (`hi - 1`). Rows with a NULL point
  * or NULL bound never match (SQL comparison semantics), and are
  * dropped before the shuffle rather than carried through it.
  */
object RangeJoin {

  /** Exact floor division on the point axis — see
    * [[org.apache.spark.sql.graftexprs.GraftFunctions.floorDiv]] for
    * why neither `DIV` nor a double `floor` is correct here. */
  private def floorDiv(x: Column, w: Long): Column =
    org.apache.spark.sql.graftexprs.GraftFunctions.floorDiv(x, w)

  /** Inner point-in-interval join: rows of `left` whose `pointCol`
    * (integral LONG axis: micros, ids, quantized doubles) falls inside
    * `right`'s `[loCol, hiCol]`, optionally ANDed with equi-keys
    * (`keys` maps left column → right column). Column names of the two
    * inputs must be disjoint apart from helper columns; project/rename
    * before calling. `bucketWidth` is the quantization step on the
    * point axis — see the class doc for how to size it. */
  def pointInInterval(
      left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val bkt = "__graft_bucket"
    require(!left.columns.contains(bkt) && !right.columns.contains(bkt),
      s"$bkt is reserved")

    val l = left
      .filter(col(pointCol).isNotNull)
      .withColumn(bkt, floorDiv(col(pointCol), bucketWidth))
    // Degenerate intervals (lo > hi) produce an empty sequence() and
    // explode away — matching the SQL predicate, which no row passes.
    val r = right
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn(bkt,
        explode(sequence(floorDiv(col(loCol), bucketWidth),
          floorDiv(col(hiCol), bucketWidth))))

    val cond = keys.foldLeft(
      l(bkt) === r(bkt) &&
        l(pointCol) >= r(loCol) && l(pointCol) <= r(hiCol)) {
      case (c, (lk, rk)) => c && l(lk) === r(rk)
    }
    l.join(r, cond).drop(bkt)
  }

  /** Inner interval-OVERLAP join: pairs whose inclusive intervals
    * intersect — `l.lo <= r.hi AND r.lo <= l.hi` — the temporal-overlap
    * shape (sessions × outages, bookings × maintenance windows) that
    * stock Spark, lacking an equi-key, plans as a nested loop. Both
    * sides are replicated over the fixed-width buckets their interval
    * covers, and each qualifying pair is counted in exactly ONE bucket:
    * the one containing `greatest(l.lo, r.lo)` — the start of the
    * intersection, which by definition lies inside BOTH intervals, so
    * both sides carry that bucket and the ownership predicate keeps
    * only it. Output-exact, no dedup.
    *
    * Degenerate rows (`lo > hi`) can still satisfy the raw predicate
    * pair (e.g. `r.lo <= l.hi < l.lo <= r.hi`), so they are NOT
    * filtered: each side explodes over the NORMALIZED span
    * `[least(lo,hi), greatest(lo,hi)]`, which provably covers the
    * ownership bucket of every qualifying pair (if `greatest(l.lo,
    * r.lo) = r.lo > l.lo` then the predicate forces `r.lo <= l.hi`, so
    * `r.lo` sits inside `[l.lo, l.hi]` — and symmetrically). Rows with
    * a NULL bound never match and are dropped pre-shuffle.
    *
    * Cost at 100 TB: replication factor per side is `span / w + 1`, so
    * size `bucketWidth` near the LONGER side's typical span (factor
    * ≈ 2 on both sides); after that it is an ordinary equi-join — AQE
    * broadcast/skew handling applies as-is. */
  def intervalOverlap(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlapNames = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapNames.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlapNames.mkString(", ")}")
    val bkt = "__graft_bucket"
    require(!left.columns.contains(bkt) && !right.columns.contains(bkt),
      s"$bkt is reserved")

    def exploded(df: DataFrame, loCol: String, hiCol: String): DataFrame =
      df.filter(col(loCol).isNotNull && col(hiCol).isNotNull)
        .withColumn(bkt, explode(sequence(
          floorDiv(least(col(loCol), col(hiCol)), bucketWidth),
          floorDiv(greatest(col(loCol), col(hiCol)), bucketWidth))))

    val l = exploded(left, lLoCol, lHiCol)
    val r = exploded(right, rLoCol, rHiCol)
    val cond = keys.foldLeft(
      l(bkt) === r(bkt) &&
        l(lLoCol) <= r(rHiCol) && r(rLoCol) <= l(lHiCol) &&
        floorDiv(greatest(l(lLoCol), r(rLoCol)), bucketWidth) === l(bkt)) {
      case (c, (lk, rk)) => c && l(lk) === r(rk)
    }
    l.join(r, cond).drop(bkt)
  }

  /** Symmetric band join: pairs where `|l.lCol - r.rCol| <= tol` —
    * near-duplicate blocking on a scalar axis (timestamps within a
    * tolerance, lengths within a delta). Sugar over [[pointInInterval]]
    * with the interval `[r - tol, r + tol]` built on the fly. */
  def bandJoin(
      left: DataFrame, lCol: String,
      right: DataFrame, rCol: String,
      tol: Long, bucketWidth: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(tol >= 0, s"tol must be non-negative, got $tol")
    val lo = "__graft_band_lo"
    val hi = "__graft_band_hi"
    val r = right
      .withColumn(lo, col(rCol) - tol)
      .withColumn(hi, col(rCol) + tol)
    pointInInterval(left, lCol, r, lo, hi, bucketWidth, keys)
      .drop(lo, hi)
  }
}
