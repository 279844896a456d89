package graft.util

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + oracle-stable numeric helpers.
  *
  * The driver compares each query's parquet output against DuckDB running
  * the paired `oracleSql` on the same tables, hashing values. Raw
  * double aggregation is order-dependent (parallel sums), so every sum
  * over a double column is routed through an exact DECIMAL cast:
  * a binary double is never exactly on a 10^-6 rounding boundary
  * (5/10^7 has a factor 5^7 in the denominator, unrepresentable in
  * binary), so double->DECIMAL(_,6) rounds identically in Spark and
  * DuckDB regardless of rounding mode, and decimal sums are exact in
  * both engines. Final results are cast back to DOUBLE (deterministic
  * nearest-double) so output schemas stay simple.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events loader. The table's `ts` is parquet TIMESTAMP(NANOS), whose
    * loaded dtype depends on the runtime: Spark <= 4.0 honors
    * `spark.sql.legacy.parquet.nanosAsLong` and yields a nanos LONG;
    * Spark 4.1+ ignores that conf and yields TIMESTAMP_NTZ (micros,
    * nanos truncated). Set the conf anyway so BOTH runtimes land on a
    * dtype [[tsMicros]] understands — never touch `ts` arithmetic
    * directly, always go through [[tsMicros]]. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }

  /** Schema-adaptive micros-since-epoch LONG for an events-style `ts`
    * column. Dispatches on the dtype the current runtime produced:
    *  - LONG (nanos, legacy conf on Spark <= 4.0): floor-div to micros —
    *    identical to the DuckDB oracle's `epoch_ns(ts) // 1000`;
    *  - TIMESTAMP_NTZ (Spark 4.1+): naive datetime diff from the epoch,
    *    deliberately session-timezone-INDEPENDENT (a cast through LTZ
    *    would shift by the session offset), matching DuckDB's naive
    *    `epoch_us(ts)` on TIMESTAMP_NS exactly (testdata nanos are whole
    *    micros, so the read-time truncation loses nothing);
    *  - TIMESTAMP: plain unix_micros. */
  def tsMicros(df: Dataset[_], tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"$tsCol DIV 1000")
      case TimestampNTZType =>
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', $tsCol)")
      case TimestampType => unix_micros(col(tsCol))
      case dt => throw new IllegalArgumentException(
        s"unsupported dtype for $tsCol: ${dt.simpleString} (expected nanos LONG, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Exact-rounding decimal view of a double column (6 digits int part headroom handled by p=12). */
  def d6(c: Column): Column = c.cast(DecimalType(12, 6))

  /** Wider variant for columns with large magnitudes (events.value, totals). */
  def d6w(c: Column): Column = c.cast(DecimalType(25, 6))

  def dbl(c: Column): Column = c.cast(DoubleType)

  /** (1 - disc) as DECIMAL(7,6): disc in [0,1) so the result fits exactly.
    * Keeping factor precision tight keeps triple products under the
    * 38-digit cap in BOTH engines => no precision-loss rounding anywhere. */
  def oneMinus(c: Column): Column =
    (lit(1).cast(DecimalType(7, 6)) - d6(c)).cast(DecimalType(7, 6))

  def onePlus(c: Column): Column =
    (lit(1).cast(DecimalType(7, 6)) + d6(c)).cast(DecimalType(7, 6))

  /** Matching DuckDB SQL fragments, so both sides do the identical arithmetic. */
  object sql {
    def d6(col: String): String = s"CAST($col AS DECIMAL(12,6))"
    def d6w(col: String): String = s"CAST($col AS DECIMAL(25,6))"
    def sumD6(col: String, as: String): String =
      s"${dblHop(s"sum(${d6(col)})")} AS $as"
    def sumD6w(col: String, as: String): String =
      s"${dblHop(s"sum(${d6w(col)})")} AS $as"
    /** Correctly-rounded decimal->double for the ORACLE side. DuckDB's
      * direct `CAST(dec AS DOUBLE)` double-rounds (hugeint->double, then
      * /10^scale) and diverges from the correctly-rounded result on ~25%
      * of values once the unscaled magnitude passes 2^53 (measured:
      * 9965/40000 random values in [2^53, 2^75]); its VARCHAR->DOUBLE
      * parse is correctly rounded (0/40000). The JVM's
      * `BigDecimal.doubleValue` — what Spark's decimal->double cast
      * calls — is parseDouble-equivalent (0/200000 against
      * `Double.parseDouble(toPlainString)` over the same regime). So
      * hopping the oracle through VARCHAR makes both engines produce the
      * bit-identical double at ANY scale factor, with the plain
      * driver-proven DOUBLE output type. (Round 19 instead emitted exact
      * DECIMAL(38,6) on both sides: values exact, but the external
      * driver's type-sensitive hash never matches DECIMAL columns across
      * its two clients — 45 gates red. Withdrawn in round 20.) */
    def dblHop(expr: String): String =
      s"CAST(CAST($expr AS VARCHAR) AS DOUBLE)"
    def oneMinus(col: String): String =
      s"CAST(1 - ${d6(col)} AS DECIMAL(7,6))"
    def onePlus(col: String): String =
      s"CAST(1 + ${d6(col)} AS DECIMAL(7,6))"
    /** revenue term: extendedprice * (1 - discount), exact decimals. */
    val revenueTerm: String =
      s"${d6("l_extendedprice")} * ${oneMinus("l_discount")}"
  }
}
