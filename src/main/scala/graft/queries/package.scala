package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType, TimestampType}

/** Shared helpers for the oracle-checked query suite.
  *
  * Determinism contract with the DuckDB oracle (see Verify.scala):
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - monetary / double aggregates are computed in DECIMAL(18,2) (exact) on
  *    BOTH sides and only cast to double at the very end, so the resulting
  *    doubles are bit-identical regardless of partial-aggregation order;
  *  - counts are LONG on both sides; year()/row_number() are cast to LONG
  *    to match DuckDB's BIGINT defaults.
  */
package object queries {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Load one driver-generated table (TESTDATA.md) from an sf dir.
    *
    * `events.ts` normalization: the driver has generated this column both
    * as parquet TIMESTAMP(NANOS) (read as LONG ns via nanosAsLong) and as
    * timestamp[us] (read as TIMESTAMP_NTZ). All query code assumes epoch-ns
    * LONG, so when a timestamp type shows up, convert here — session tz is
    * UTC in every entry point, so the NTZ→timestamp cast is identity and
    * matches DuckDB's epoch_us/epoch_ns on the same naive values.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == TimestampType ||
                      f.dataType == TimestampNTZType =>
        df.withColumn(
          "ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case _ => df
    }
  }

  /** Exact monetary arithmetic: 2-decimal doubles -> DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
}
