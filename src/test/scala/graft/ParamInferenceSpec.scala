package graft

import org.apache.spark.sql.types._

class ParamInferenceSpec extends SparkTestBase {

  private def withTable[T](f: => T): T = {
    spark.sql("DROP TABLE IF EXISTS pi_users")
    spark.sql("CREATE TABLE pi_users (id BIGINT, name STRING, balance DOUBLE, joined DATE) USING parquet")
    try f finally spark.sql("DROP TABLE pi_users")
  }

  test("WHERE equality placeholders resolve to column types (parser.rs:103-133)") {
    withTable {
      val s = ParamInference.inferParameterSchema(spark,
        "SELECT * FROM pi_users WHERE id = ? AND name = ?")
      assert(s.fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq(("id", LongType), ("name", StringType)))
    }
  }

  test("IN and reversed comparisons associate too (parser.rs:323-404)") {
    withTable {
      val s = ParamInference.inferParameterSchema(spark,
        "SELECT * FROM pi_users WHERE ? < balance AND id IN (?, ?)")
      assert(s.fields.map(_.dataType).toSeq == Seq(DoubleType, LongType, LongType))
    }
  }

  test("INSERT all-placeholder VALUES maps to table columns in order (parser.rs:168-221)") {
    withTable {
      val s = ParamInference.inferParameterSchema(spark,
        "INSERT INTO pi_users VALUES (?, ?, ?, ?)")
      assert(s.fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq(("id", LongType), ("name", StringType), ("balance", DoubleType), ("joined", DateType)))
    }
  }

  test("multi-row INSERT placeholders repeat the column cycle") {
    withTable {
      val s = ParamInference.inferParameterSchema(spark,
        "INSERT INTO pi_users (id, name) VALUES (?, ?), (?, ?)")
      assert(s.fields.map(_.name).toSeq == Seq("id", "name", "id", "name"))
      assert(s.fields.map(_.dataType).toSeq == Seq(LongType, StringType, LongType, StringType))
    }
  }

  test("unassociated placeholders fall back to Utf8 $n (prepared.rs:123-135)") {
    val s = ParamInference.inferParameterSchema(spark, "SELECT ? AS a, 1 + ? AS b")
    assert(s.fields.forall(_.dataType == StringType))
    assert(s.fields.map(_.name).toSeq == Seq("$1", "$2"))
  }

  test("placeholder count is quote-aware (connection.rs:104-106)") {
    assert(ParamInference.countPlaceholders("SELECT '?' , ? -- ?\n, ?") == 2)
    assert(ParamInference.countPlaceholders("SELECT 1") == 0)
  }

  test("prepared statements execute through native positional binding") {
    withTable {
      spark.sql("INSERT INTO pi_users VALUES (1, 'ann', 10.5, DATE'2024-01-01'), (2, 'bob', 20.0, DATE'2024-06-01')")
      val sess = new Session("pi", spark)
      val p = sess.createPrepared("SELECT name FROM pi_users WHERE id = ? OR balance > ?")
      assert(p.paramSchema.fields.map(_.dataType).toSeq == Seq(LongType, DoubleType))
      sess.bindParams(p.handle, Seq(1L, 15.0))
      val names = sess.executePrepared(p.handle).collect().map(_.getString(0)).sorted.toSeq
      assert(names == Seq("ann", "bob"))
    }
  }
}
