package graft.fls

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.fls.Format._
import graft.fls.connector.FlsZoneMap

class FlsZoneMapSpec extends AnyFunSuite {

  private def rg(min: Long, max: Long): RowGroupDesc =
    RowGroupDesc(1024, Array(SegmentDesc(0, 0, 0, hasStats = true, min, max, 0, 0)))

  private val cols = Array(ColumnDesc("x", ColumnType(TypeTag.INT64)))
  private val idx = Map("x" -> 0)

  private def keeps(f: Filter, min: Long, max: Long): Boolean =
    FlsZoneMap.mayMatch(rg(min, max), idx, cols, Array(f), 0L)

  test("range and equality pruning") {
    assert(!keeps(EqualTo("x", 5L), 10, 20))
    assert(keeps(EqualTo("x", 15L), 10, 20))
    assert(!keeps(GreaterThan("x", 20L), 10, 20))
    assert(keeps(GreaterThanOrEqual("x", 20L), 10, 20))
    assert(!keeps(LessThan("x", 10L), 10, 20))
    assert(keeps(LessThanOrEqual("x", 10L), 10, 20))
    assert(keeps(In("x", Array(1L, 15L)), 10, 20))
    assert(!keeps(In("x", Array(1L, 2L)), 10, 20))
  }

  test("IsNull prunes everything (no-NULL format); IsNotNull keeps") {
    assert(!keeps(IsNull("x"), 10, 20))
    assert(keeps(IsNotNull("x"), 10, 20))
  }

  test("And/Or combinations") {
    assert(!keeps(And(GreaterThan("x", 5L), LessThan("x", 8L)), 10, 20))
    assert(keeps(Or(LessThan("x", 5L), GreaterThan("x", 15L)), 10, 20))
    assert(!keeps(Or(LessThan("x", 5L), GreaterThan("x", 50L)), 10, 20))
  }

  test("strict compares never mis-prune past 2^53 (1-ulp margin)") {
    val big = (1L << 53) + 1
    // max = 2^53+1 > 2^53 exactly, but both round to the same double
    assert(keeps(GreaterThan("x", 1L << 53), big - 10, big))
    assert(keeps(LessThan("x", big), big, big + 10))
  }

  test("unknown columns and unconvertible values keep the row group") {
    assert(keeps(EqualTo("y", 5L), 10, 20))
    assert(keeps(EqualTo("x", "not-a-number"), 10, 20))
  }

  test("virtual row-number range pruning") {
    val plain = RowGroupDesc(1024, Array(SegmentDesc(0, 0, 0, false, 0, 0, 0, 0)))
    // row group covers rows [2048, 3072)
    assert(!FlsZoneMap.mayMatch(plain, idx, cols,
      Array(LessThan(connector.FlsVirtual.RowNumber, 1000L)), 2048L))
    assert(FlsZoneMap.mayMatch(plain, idx, cols,
      Array(GreaterThanOrEqual(connector.FlsVirtual.RowNumber, 3000L)), 2048L))
    assert(!FlsZoneMap.mayMatch(plain, idx, cols,
      Array(GreaterThanOrEqual(connector.FlsVirtual.RowNumber, 4000L)), 2048L))
  }
}
