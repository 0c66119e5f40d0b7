package graft

import graft.sources.MutableCatalog
import org.apache.spark.sql.types._

/** The YCSB workload shape the reference benches against
  * (tests/benchbase/ycsb-flight-sql.xml:24 — read/scan/insert/update/
  * delete/read-modify-write = 50/5/15/10/10/10 over `usertable`,
  * DDL at ycsb-ddl-ducklake.sql:1-14), exercised end-to-end on the
  * mutable-catalog DML surface.
  */
class YcsbSpec extends SparkTestBase {

  private val usertable = StructType(
    StructField("ycsb_key", LongType) +:
      (1 to 10).map(i => StructField(s"field$i", StringType)))

  test("YCSB operation mix: point read, scan, insert, update, delete, RMW") {
    val cat = MutableCatalog(spark)
    cat.create("usertable", usertable, primaryKey = Some("ycsb_key"))

    // load phase
    val rows = (1 to 50).map(k =>
      s"($k, ${(1 to 10).map(f => s"'v${k}_$f'").mkString(", ")})").mkString(", ")
    assert(cat.route(s"INSERT INTO usertable VALUES $rows").contains(50))

    // point read (WHERE ycsb_key = ?, sql/parser.rs:511-533)
    val read = SqlParams.bind("SELECT * FROM usertable WHERE ycsb_key = ?", Seq(7L))
    assert(spark.sql(read).head.getString(1) == "v7_1")

    // scan (range)
    val scan = spark.sql("SELECT ycsb_key FROM usertable WHERE ycsb_key BETWEEN 10 AND 19 ORDER BY ycsb_key")
    assert(scan.count() == 10)

    // insert (PK-checked: duplicate must error)
    assert(cat.route("INSERT INTO usertable VALUES (51, 'a','b','c','d','e','f','g','h','i','j')").contains(1))
    intercept[RuntimeException](
      cat.route("INSERT INTO usertable VALUES (51, 'x','x','x','x','x','x','x','x','x','x')"))

    // update
    assert(cat.route(SqlParams.bind(
      "UPDATE usertable SET field1 = ? WHERE ycsb_key = ?", Seq("updated", 7L))).contains(1))
    assert(spark.sql("SELECT field1 FROM usertable WHERE ycsb_key = 7").head.getString(0) == "updated")

    // delete
    assert(cat.route("DELETE FROM usertable WHERE ycsb_key = 51").contains(1))
    assert(spark.sql("SELECT COUNT(*) FROM usertable WHERE ycsb_key = 51").head.getLong(0) == 0)

    // read-modify-write
    val cur = spark.sql("SELECT field2 FROM usertable WHERE ycsb_key = 3").head.getString(0)
    cat.route(SqlParams.bind(
      "UPDATE usertable SET field2 = ? WHERE ycsb_key = ?", Seq(cur + "-rmw", 3L)))
    assert(spark.sql("SELECT field2 FROM usertable WHERE ycsb_key = 3").head.getString(0) == "v3_2-rmw")

    // final integrity: 50 rows, key set intact
    assert(spark.sql("SELECT COUNT(*) FROM usertable").head.getLong(0) == 50)
  }
}
