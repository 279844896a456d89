// Lives under org.apache.spark.sql to reach private[sql] helpers
// (classic.ExpressionUtils) — same pattern as ArrayExprs.
package org.apache.spark.sql.graftexprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DataTypes, DoubleType, LongType}

/** Morton (Z-order) code of N numeric columns, quantile-normalized.
  *
  * Each input value is mapped to its quantile bucket by binary search
  * over a precomputed cut array (`cuts(i)` — strictly increasing; the
  * builder derives them from `approxQuantile`, so skewed distributions
  * still spread uniformly over buckets), then the bucket bits of all
  * dimensions are interleaved LSB-first into one Long. Sorting by that
  * Long is the classic multi-dimensional clustering layout: rows close
  * in Z-value are close in EVERY dimension, so per-row-group zone maps
  * ([[graft.fls.connector.FlsZoneMap]]) stay narrow on each clustered
  * column simultaneously — a range/point filter on ANY of the columns
  * skips row groups, not just a filter on the leading sort column.
  *
  * NULL handling: a null value takes bucket 0 (below every cut), so the
  * expression itself is never null and null rows cluster together at
  * the low end. All dimensions share one bit width (from the largest
  * cut array); `dims * bits` must fit a Long's 63 value bits.
  */
case class ZValue(children: Seq[Expression], cuts: Seq[Array[Double]])
  extends Expression {

  require(children.nonEmpty && children.size == cuts.size,
    "zvalue: one cut array per input column required")

  /** Bit width per dimension: buckets run [0, cuts.length + 1] (0 is
    * the null bucket, i+1 for insertion point i). All dimensions share
    * the widest width; narrower dimensions are MSB-ALIGNED into it
    * (bucket << shift) rather than zero-padded — a low-cardinality
    * dimension must vary the HIGH interleave bits, or it would only
    * wiggle inside row groups and never cluster across them. */
  private def widthOf(maxBucket: Int): Int =
    64 - java.lang.Long.numberOfLeadingZeros(maxBucket.toLong).max(1)
  private val bits: Int = cuts.map(c => widthOf(c.length + 1)).max
  private val shifts: Seq[Int] = cuts.map(c => bits - widthOf(c.length + 1))
  require(children.size * bits <= 63,
    s"zvalue: ${children.size} dims x $bits bits exceeds a Long (reduce buckets or columns)")

  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "zvalue expects DoubleType inputs (cast upstream)")
  }

  /** Bucket of dimension `i` spread onto the interleaved bit positions
    * (bit j of the bucket lands at position j*dims + i). Public: the
    * generated code calls it per dimension. */
  def dimBits(i: Int, isNull: Boolean, v: Double): Long = {
    val bucket =
      if (isNull) 0L
      else {
        val idx = java.util.Arrays.binarySearch(cuts(i), v)
        ((if (idx >= 0) idx else -idx - 1) + 1).toLong << shifts(i)
      }
    var out = 0L
    var j = 0
    val k = children.size
    while (j < bits) {
      out |= ((bucket >> j) & 1L) << (j * k + i)
      j += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      z |= dimBits(i, v == null, if (v == null) 0.0 else v.asInstanceOf[Double])
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zv", this, classOf[ZValue].getName)
    val evals = children.map(_.genCode(ctx))
    val acc = ctx.freshName("z")
    val dims = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |$acc |= $ref.dimBits($i, ${e.isNull}, ${e.isNull} ? 0.0 : ${e.value});
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long $acc = 0L;
        |$dims
        |final long ${ev.value} = $acc;
      """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZValue {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column form (lives here because ExpressionUtils is private[sql]). */
  def column(cols: Seq[Column], cutsPerCol: Seq[Array[Double]]): Column =
    ExpressionUtils.column(ZValue(
      cols.map(c => ExpressionUtils.expression(c.cast("double"))), cutsPerCol))
}
