package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

package object ops {
  /** Timestamp literal as TIMESTAMP_NTZ. All driver tables carry naive
    * (session-less) parquet timestamps, which Spark 4 reads as
    * TIMESTAMP_NTZ; an NTZ literal keeps comparisons cast-free on the
    * column side so the predicate pushes into the parquet scan.
    */
  def tsLit(s: String): Column = lit(s).cast("timestamp_ntz")
}
