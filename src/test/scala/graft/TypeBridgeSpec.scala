package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeBridgeSpec extends AnyFunSuite {

  test("signed integer aliases map to Spark integral types (types.rs:36-39)") {
    assert(TypeBridge.toSpark("BIGINT") == LongType)
    assert(TypeBridge.toSpark("int8") == LongType)
    assert(TypeBridge.toSpark("LONG") == LongType)
    assert(TypeBridge.toSpark("INTEGER") == IntegerType)
    assert(TypeBridge.toSpark("SIGNED") == IntegerType)
    assert(TypeBridge.toSpark("SMALLINT") == ShortType)
    assert(TypeBridge.toSpark("INT2") == ShortType)
    assert(TypeBridge.toSpark("TINYINT") == ByteType)
  }

  test("unsigned ints widen so max values fit (table_schema_test.test u64 max)") {
    assert(TypeBridge.toSpark("UBIGINT") == DecimalType(20, 0))
    assert(TypeBridge.toSpark("UINTEGER") == LongType)
    assert(TypeBridge.toSpark("USMALLINT") == IntegerType)
    assert(TypeBridge.toSpark("UTINYINT") == ShortType)
    // Decimal(20,0) holds 18446744073709551615
    assert(BigDecimal("18446744073709551615").precision <= 20)
  }

  test("strings, booleans, floats, binary, uuid, json (types.rs:46-70)") {
    Seq("VARCHAR", "CHAR", "BPCHAR", "TEXT", "STRING", "UUID", "JSON")
      .foreach(t => assert(TypeBridge.toSpark(t) == StringType, t))
    Seq("BOOLEAN", "BOOL", "LOGICAL").foreach(t => assert(TypeBridge.toSpark(t) == BooleanType))
    assert(TypeBridge.toSpark("DOUBLE") == DoubleType)
    // the multi-word alias the reference accepts (types.rs:50) — missed
    // until the r20 wire review
    assert(TypeBridge.toSpark("DOUBLE PRECISION") == DoubleType)
    assert(TypeBridge.toSpark("FLOAT4") == FloatType)
    Seq("BLOB", "BYTEA", "BINARY", "VARBINARY", "BIT", "BITSTRING")
      .foreach(t => assert(TypeBridge.toSpark(t) == BinaryType))
  }

  test("INTERVAL prefix-matches like the reference (types.rs:72)") {
    assert(TypeBridge.toSpark("INTERVAL") == DayTimeIntervalType())
    assert(TypeBridge.toSpark("INTERVAL DAY TO SECOND") == DayTimeIntervalType())
    assert(TypeBridge.toSpark("INTERVAL HOUR") == DayTimeIntervalType())
    assert(TypeBridge.toSpark("INTERVAL YEAR TO MONTH") == YearMonthIntervalType())
    assert(TypeBridge.toSpark("INTERVAL MONTH") == YearMonthIntervalType())
  }

  test("temporal types: naive vs tz timestamps (types.rs:53-62)") {
    assert(TypeBridge.toSpark("DATE") == DateType)
    assert(TypeBridge.toSpark("TIMESTAMP") == TimestampNTZType)
    assert(TypeBridge.toSpark("DATETIME") == TimestampNTZType)
    assert(TypeBridge.toSpark("TIMESTAMPTZ") == TimestampType)
    assert(TypeBridge.toSpark("TIME") == LongType)
  }

  test("decimal grammar: explicit, default (18,3), cap at 38 (types.rs:74-130)") {
    assert(TypeBridge.toSpark("DECIMAL(10,2)") == DecimalType(10, 2))
    assert(TypeBridge.toSpark("NUMERIC(5)") == DecimalType(5, 0))
    assert(TypeBridge.toSpark("DECIMAL") == DecimalType(18, 3))
    assert(TypeBridge.toSpark("NUMERIC") == DecimalType(18, 3))
    assert(TypeBridge.toSpark("DECIMAL(76,10)") == DecimalType(38, 10))
    assert(TypeBridge.toSpark("HUGEINT") == DecimalType(38, 0))
    assert(TypeBridge.toSpark("UHUGEINT") == DecimalType(38, 0))
  }

  test("array suffixes recurse, incl. nested (types.rs:27-31,95-101)") {
    assert(TypeBridge.toSpark("INTEGER[]") == ArrayType(IntegerType))
    assert(TypeBridge.toSpark("VARCHAR[][]") == ArrayType(ArrayType(StringType)))
    assert(TypeBridge.toSpark("DECIMAL(10,2)[]") == ArrayType(DecimalType(10, 2)))
  }

  test("MAP/STRUCT are out of contract and error (types.rs:89-92)") {
    intercept[TypeBridge.UnsupportedTypeException](TypeBridge.toSpark("MAP(VARCHAR, INTEGER)"))
    intercept[TypeBridge.UnsupportedTypeException](TypeBridge.toSpark("STRUCT(a INTEGER)"))
  }

  test("reverse mapping round-trips the core types") {
    val types = Seq(LongType, IntegerType, ShortType, ByteType, StringType, BooleanType,
      DoubleType, FloatType, DateType, TimestampNTZType, TimestampType, BinaryType,
      DecimalType(12, 4), ArrayType(LongType))
    types.foreach { dt =>
      assert(TypeBridge.toSpark(TypeBridge.toDuckName(dt)) == dt, dt.toString)
    }
  }
}
