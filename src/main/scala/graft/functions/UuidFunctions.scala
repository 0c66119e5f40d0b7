package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UUID text⇄binary bridging (SURVEY §1.2: DuckDB UUID is Arrow
  * FixedSizeBinary(16), surfaced as canonical text — types.rs:66; the
  * reference round-trips '550e8400-e29b-41d4-a716-446655440000' as text,
  * tests/sql/table_schema_test.test). Pure built-in compositions, so
  * both stay inside whole-stage codegen.
  */
object UuidFunctions {

  /** 16-byte binary UUID → canonical lowercase text form. */
  def uuidCanonical(bin: Column): Column = {
    val h = lower(hex(bin))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Canonical text UUID → 16-byte binary. */
  def uuidToBinary(text: Column): Column =
    unhex(regexp_replace(text, "-", ""))
}
