package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (when
  * SQL-expressible) its DuckDB oracle. Queries without an oracle get the
  * driver's weaker rows-only check. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Read a fixture table. */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads as a long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    * Verify/Bench). Convert to a microsecond timestamp with exact integral
    * division (a double divide would lose sub-µs precision at 2^60 nanos). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = tbl(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }

  // ---- determinism helpers for oracle-checked queries -------------------
  // Double aggregation order differs between engines, so oracle-checked
  // sums run through an exact DECIMAL accumulator and convert back to
  // double: the per-element double→decimal rounding is well-defined (no
  // representable ties) and decimal addition is associative, making the
  // result engine- and partition-order-independent. DuckDB twin:
  //   CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast(DoubleType)

  /** Deterministic average: exact sum / count, divided in double. */
  def davg(c: Column): Column = dsum(c) / count(c).cast(DoubleType)

  /** Timestamp rendered as a stable string (oracle: strftime '%Y-%m-%d %H:%M:%S'). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Date-only string (oracle: strftime '%Y-%m-%d'). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Integer output normalized to BIGINT on both engines. */
  def big(c: Column): Column = c.cast(LongType)
}
