package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Timestamp-flavor-tolerant time arithmetic.
  *
  * Parquet event time arrives in two physical flavors depending on how the
  * upstream writer annotated it: `TIMESTAMP(isAdjustedToUTC=true)` reads as
  * Spark `TimestampType` (LTZ) while `isAdjustedToUTC=false` reads as
  * `TimestampNTZType` — and several built-ins that operators lean on
  * (`unix_micros`, cast-to-double) accept only the LTZ flavor, failing
  * analysis with DATATYPE_MISMATCH on NTZ input. Every graft entry point
  * pins `spark.sql.session.timeZone=UTC`, which makes the NTZ→LTZ cast a
  * pure re-tagging (identical wall clock, identical epoch), so operators can
  * accept either flavor by routing time arithmetic through these helpers
  * instead of calling the built-ins directly.
  *
  * The reference's monitor tables (sessionization, funnels, as-of lookups in
  * `peerdb_psql_clickhouse_monitor.ps1`) are all defined on epoch arithmetic
  * and are flavor-agnostic in ClickHouse; these helpers give the Spark
  * operators the same tolerance.
  */
object TimeCols {

  /** The column as a session-zone `TimestampType`, whatever flavor it is.
    * A no-op for columns already LTZ; a wall-clock-preserving re-tag for NTZ
    * (sessions pin UTC); a parse for string input.
    */
  def ltz(c: Column): Column = c.cast(TimestampType)

  /** Exact integer epoch microseconds of either timestamp flavor. */
  def micros(c: Column): Column = unix_micros(ltz(c))

  /** Epoch seconds (fractional) of either timestamp flavor. */
  def seconds(c: Column): Column = ltz(c).cast(DoubleType)
}
