package graft

/** Static SqlInfo capability constants — the reference's
  * `build_sql_info_data` (swanlake-core/src/service/handlers/
  * sql_info.rs:20-36): the Flight SQL GetSqlInfo answer advertising
  * engine capabilities to ADBC clients. The reference advertises
  * exactly four infos (server transaction support, transactions
  * supported, default isolation = serializable, isolation mask
  * 0b11110); this map carries those plus the additive server-identity
  * block every real Flight SQL server answers.
  *
  * Ids follow the public arrow FlightSql.proto `SqlInfo` enum. The
  * 0–9 server block and the 500-series syntax block are stable spec
  * ids; the transaction-syntax trio (540–542) must be re-checked
  * against the generated enum when flight jars arrive and the gRPC
  * adapter re-encodes this map (r20 wire review: TRANSACTION was
  * previously advertised at a nonexistent id 514 — an ADBC client
  * probing the spec id 8 saw no transaction support at all).
  */
object SqlInfo {

  /** Flight SQL info ids (arrow-flight-sql spec, public). */
  val FLIGHT_SQL_SERVER_NAME = 0
  val FLIGHT_SQL_SERVER_VERSION = 1
  val FLIGHT_SQL_SERVER_ARROW_VERSION = 2
  val FLIGHT_SQL_SERVER_READ_ONLY = 3
  val FLIGHT_SQL_SERVER_TRANSACTION = 8
  val SQL_DDL_CATALOG = 500
  val SQL_DDL_SCHEMA = 501
  val SQL_DDL_TABLE = 502
  val SQL_IDENTIFIER_CASE = 503
  val SQL_IDENTIFIER_QUOTE_CHAR = 504
  val SQL_DEFAULT_TRANSACTION_ISOLATION = 540
  val SQL_TRANSACTIONS_SUPPORTED = 541
  val SQL_SUPPORTED_TRANSACTIONS_ISOLATION_LEVELS = 542

  /** Transaction support level: TRANSACTION (= 1, plain transactions
    * without savepoints) — sql_info.rs advertises transaction support
    * with serializable isolation semantics.
    */
  val transactionSupport = 1

  /** SqlTransactionIsolationLevel::SqlTransactionSerializable. */
  val serializableIsolation = 4

  /** Supported-isolation bitmask from the reference: 0b11110
    * (read-committed through serializable; not read-uncommitted).
    */
  val isolationMask = 0x1e

  val values: Map[Int, Any] = Map(
    FLIGHT_SQL_SERVER_NAME -> "swanlakespark",
    FLIGHT_SQL_SERVER_VERSION -> "0.1.0",
    FLIGHT_SQL_SERVER_ARROW_VERSION -> "18.3.0",
    FLIGHT_SQL_SERVER_READ_ONLY -> false,
    FLIGHT_SQL_SERVER_TRANSACTION -> transactionSupport,
    SQL_DDL_CATALOG -> false,   // catalogs are registered, not DDL-created
    SQL_DDL_SCHEMA -> true,
    SQL_DDL_TABLE -> true,
    // SqlSupportedCaseSensitivity: case-insensitive resolution (the
    // engine matches DuckDB's case-insensitive identifier semantics)
    SQL_IDENTIFIER_CASE -> 3,
    SQL_IDENTIFIER_QUOTE_CHAR -> "\"",
    SQL_DEFAULT_TRANSACTION_ISOLATION -> serializableIsolation,
    SQL_TRANSACTIONS_SUPPORTED -> true,
    SQL_SUPPORTED_TRANSACTIONS_ISOLATION_LEVELS -> isolationMask)
}
