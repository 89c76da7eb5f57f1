package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

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

  /** Load one driver-generated table (TESTDATA.md) from an sf dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact monetary arithmetic: 2-decimal doubles -> DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
}
