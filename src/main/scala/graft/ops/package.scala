package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{expr, lit}

package object ops {
  /** Timestamp literal as TIMESTAMP_NTZ. All driver tables carry naive
    * (session-less) parquet timestamps, which Spark 4 reads as
    * TIMESTAMP_NTZ; an NTZ literal keeps comparisons cast-free on the
    * column side so the predicate pushes into the parquet scan.
    */
  def tsLit(s: String): Column = lit(s).cast("timestamp_ntz")

  private val HexAlphabet = "0123456789abcdef"

  /** Value of the 1-based `pos`-th hex digit of md5(doc_id|salt) — the
    * engine-portable randomness primitive every deterministic
    * split/sample/shard op builds on. The instr/substring arithmetic
    * is kept bit-identical with the DuckDB oracles' strpos/substr form;
    * THIS is the single Scala copy (the SQL twins live with each
    * oracle).
    */
  def md5HexDigit(salt: String, pos: Int): Column = expr(
    s"instr('$HexAlphabet', substring(md5(concat_ws('|', cast(doc_id as string), '$salt')), $pos, 1))") - 1

  /** 16-bit uniform in [0, 65536) from the first four hex digits of
    * md5(doc_id|salt). Integer compares against it make keep decisions
    * bit-identical across engines, runs, and layouts.
    */
  def md5U16(salt: String): Column =
    (((md5HexDigit(salt, 1) * 16 + md5HexDigit(salt, 2)) * 16 +
      md5HexDigit(salt, 3)) * 16 + md5HexDigit(salt, 4)).cast("long")
}
