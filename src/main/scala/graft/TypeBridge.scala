package graft

import org.apache.spark.sql.types._

/** DuckDB-dialect type-name grammar → Spark `DataType`.
  *
  * Reimplements the reference's type bridge (swanlake-core/src/types.rs:23-130):
  * every alias the reference maps to an Arrow type is mapped here to the
  * Spark type chosen in SURVEY §1.2. Notable decisions:
  *
  *  - unsigned ints widen (UTINYINT→Short, USMALLINT→Int, UINTEGER→Long,
  *    UBIGINT→Decimal(20,0)) so the reference's u64 max 18446744073709551615
  *    round-trips without overflow (tests/sql/table_schema_test.test);
  *  - DECIMAL defaults to (18,3) when unparenthesized (types.rs:112,128) and
  *    precision is capped at Spark's 38 (the reference caps at 76 via
  *    Decimal256, types.rs:74-85 — p>38 is narrowed, recorded lossy);
  *  - HUGEINT/BIGNUM/UHUGEINT → Decimal(38,0) (types.rs:87-88);
  *  - `T[]` suffixes recurse to ArrayType (types.rs:27-31,95-101);
  *  - TIME has no Spark type → LongType micros (SURVEY §1.2);
  *  - TIMESTAMP is naive (TimestampNTZ), TIMESTAMPTZ is session-TZ
  *    TimestampType (types.rs:55-62);
  *  - MAP/STRUCT are out of the reference's contract (types.rs:89-92) and
  *    throw the same unsupported error.
  */
object TypeBridge {

  final case class UnsupportedTypeException(name: String)
    extends IllegalArgumentException(s"Unsupported DuckDB type: $name")

  /** Parse a DuckDB type string (case-insensitive, with `[]` suffixes and
    * DECIMAL(p,s) arguments) to the Spark type.
    */
  def toSpark(duckType: String): DataType = {
    val s = duckType.trim
    if (s.endsWith("[]")) return ArrayType(toSpark(s.dropRight(2)))
    val upper = s.toUpperCase
    val open = upper.indexOf('(')
    val base = (if (open < 0) upper else upper.substring(0, open)).trim
    def args: Option[(Int, Int)] = splitArgs(upper)._2
    base match {
      case "BIGINT" | "INT8" | "LONG"                              => LongType
      case "INTEGER" | "INT" | "INT4" | "SIGNED"                   => IntegerType
      case "SMALLINT" | "INT2" | "SHORT"                           => ShortType
      case "TINYINT" | "INT1"                                      => ByteType
      case "UBIGINT"                                               => DecimalType(20, 0)
      case "UINTEGER"                                              => LongType
      case "USMALLINT"                                             => IntegerType
      case "UTINYINT"                                              => ShortType
      case "VARCHAR" | "CHAR" | "BPCHAR" | "TEXT" | "STRING"       => StringType
      case "BOOLEAN" | "BOOL" | "LOGICAL"                          => BooleanType
      case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT8"                => DoubleType
      case "FLOAT" | "FLOAT4" | "REAL"                             => FloatType
      case "DATE"                                                  => DateType
      case "TIME"                                                  => LongType // micros; no TimeType pre-4.1 wire
      case "TIMESTAMP" | "DATETIME"                                => TimestampNTZType
      case "TIMESTAMPTZ" | "TIMESTAMP WITH TIME ZONE"              => TimestampType
      case "BLOB" | "BYTEA" | "BINARY" | "VARBINARY" | "BIT" | "BITSTRING" => BinaryType
      case "UUID"                                                  => StringType // canonical text form
      case "JSON"                                                  => StringType
      // the reference PREFIX-matches INTERVAL (types.rs:72), accepting
      // qualified forms like INTERVAL DAY TO SECOND / INTERVAL YEAR
      case iv if iv == "INTERVAL" || iv.startsWith("INTERVAL ") =>
        if (iv.contains("YEAR") || iv.contains("MONTH")) YearMonthIntervalType()
        else DayTimeIntervalType()
      case "DECIMAL" | "NUMERIC" =>
        args match {
          case Some((p, sc)) => DecimalType(math.min(p, DecimalType.MAX_PRECISION), math.min(sc, math.min(p, DecimalType.MAX_PRECISION)))
          case None          => DecimalType(18, 3) // types.rs:112,128 default
        }
      case "HUGEINT" | "BIGNUM" | "UHUGEINT"                       => DecimalType(38, 0)
      case _ => throw UnsupportedTypeException(duckType)
    }
  }

  /** Spark type → the DuckDB type name the reference would report
    * (reverse direction of types.rs, used by metadata answers).
    */
  def toDuckName(dt: DataType): String = dt match {
    case LongType                => "BIGINT"
    case IntegerType             => "INTEGER"
    case ShortType               => "SMALLINT"
    case ByteType                => "TINYINT"
    case StringType              => "VARCHAR"
    case BooleanType             => "BOOLEAN"
    case DoubleType              => "DOUBLE"
    case FloatType               => "FLOAT"
    case DateType                => "DATE"
    case TimestampNTZType        => "TIMESTAMP"
    case TimestampType           => "TIMESTAMPTZ"
    case BinaryType              => "BLOB"
    case d: DecimalType          => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _)         => s"${toDuckName(e)}[]"
    case _: DayTimeIntervalType  => "INTERVAL"
    case _: YearMonthIntervalType => "INTERVAL"
    case other => throw UnsupportedTypeException(other.sql)
  }

  private def splitArgs(s: String): (String, Option[(Int, Int)]) = {
    val open = s.indexOf('(')
    if (open < 0) (s.trim, None)
    else {
      val close = s.lastIndexOf(')')
      require(close > open, s"malformed type: $s")
      val base = s.substring(0, open).trim
      val parts = s.substring(open + 1, close).split(',').map(_.trim)
      parts match {
        case Array(p)     => (base, Some((p.toInt, 0)))
        case Array(p, sc) => (base, Some((p.toInt, sc.toInt)))
        case _            => throw UnsupportedTypeException(s)
      }
    }
  }
}
