package graft

/** Static SqlInfo capability constants — the reference's
  * `build_sql_info_data` (swanlake-core/src/service/handlers/
  * sql_info.rs:20-36): the Flight SQL GetSqlInfo answer advertising
  * engine capabilities to ADBC clients. Values mirror the reference
  * 1:1 so a client switching engines sees the same capability set.
  */
object SqlInfo {

  /** Flight SQL info ids (arrow-flight-sql spec, public). */
  val FLIGHT_SQL_SERVER_NAME = 0
  val FLIGHT_SQL_SERVER_VERSION = 1
  val FLIGHT_SQL_SERVER_ARROW_VERSION = 2
  val FLIGHT_SQL_SERVER_READ_ONLY = 3
  val SQL_DDL_CATALOG = 500
  val SQL_DDL_SCHEMA = 501
  val SQL_DDL_TABLE = 502
  val SQL_IDENTIFIER_CASE = 503
  val SQL_IDENTIFIER_QUOTE_CHAR = 504
  val FLIGHT_SQL_SERVER_TRANSACTION = 514

  /** Transaction support level: TRANSACTION (= 1, plain transactions
    * without savepoints) — sql_info.rs advertises transaction support
    * with serializable isolation semantics.
    */
  val transactionSupport = 1

  /** Supported-isolation bitmask from the reference: 0b11110
    * (read-committed through serializable; not read-uncommitted).
    */
  val isolationMask = 0x1e

  val values: Map[Int, Any] = Map(
    FLIGHT_SQL_SERVER_NAME -> "swanlakespark",
    FLIGHT_SQL_SERVER_VERSION -> "0.1.0",
    FLIGHT_SQL_SERVER_ARROW_VERSION -> "18.3.0",
    FLIGHT_SQL_SERVER_READ_ONLY -> false,
    SQL_DDL_CATALOG -> false,   // catalogs are registered, not DDL-created
    SQL_DDL_SCHEMA -> true,
    SQL_DDL_TABLE -> true,
    SQL_IDENTIFIER_CASE -> 1,   // case-insensitive, stored lower
    SQL_IDENTIFIER_QUOTE_CHAR -> "\"",
    FLIGHT_SQL_SERVER_TRANSACTION -> transactionSupport)
}
