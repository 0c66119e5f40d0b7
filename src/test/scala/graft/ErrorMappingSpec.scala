package graft

class ErrorMappingSpec extends SparkTestBase {
  import ErrorMapping._

  private def failureOf(f: => Any): Throwable =
    intercept[Throwable](f)

  test("missing table maps to NotFound (error_status.test query error)") {
    val t = failureOf(spark.sql("SELECT * FROM missing_table_for_error_status").collect())
    assert(classify(t) == NotFound)
  }

  test("parse errors map to InvalidArgument") {
    val t = failureOf(spark.sql("SELEKT 1").collect())
    assert(classify(t) == InvalidArgument)
  }

  test("duplicate key maps to AlreadyExists (error_status.test dup PK)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("err_pk").resolve("t").toString
    val mt = sources.MutableTable.create(spark, dir,
      StructType(Seq(StructField("id", LongType))), Some("id"))
    val one = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L)), 1),
      StructType(Seq(StructField("id", LongType))))
    mt.insert(one)
    val t = failureOf(mt.insert(one))
    assert(classify(t) == AlreadyExists)
  }

  test("unknown prepared handle maps to NotFound; session cap to ResourceExhausted") {
    val s = new Session("em", spark)
    assert(classify(failureOf(s.executePrepared("nope"))) == NotFound)
    val reg = new SessionRegistry(spark, maxSessions = 1)
    reg.getOrCreate("a")
    assert(classify(failureOf(reg.getOrCreate("b"))) == ResourceExhausted)
  }

  test("unclassified errors map to Internal") {
    assert(classify(new RuntimeException("boom")) == Internal)
  }

  test("commit-time write-write conflict maps to FailedPrecondition") {
    val cat = sources.MutableCatalog(spark)
    import org.apache.spark.sql.types._
    cat.create("em_confl", StructType(Seq(StructField("id", LongType))))
    val txn = cat.beginTxn()
    cat.route("INSERT INTO em_confl VALUES (1)", Some(txn))
    cat.route("INSERT INTO em_confl VALUES (2)") // autocommit write drifts the base
    val t = failureOf(cat.commitTxn(txn))
    assert(classify(t) == FailedPrecondition, s"got ${classify(t)} for $t")
    cat.drop("em_confl")
  }

  test("interval parameters bind as interval literals (parameter_types.rs:172-229)") {
    assert(SqlParams.literal(java.time.Duration.ofMinutes(90)) == "INTERVAL '5400' SECOND")
    assert(SqlParams.literal(java.time.Period.ofYears(2)) == "INTERVAL '24' MONTH")
    val s = new Session("iv", spark)
    val p = s.createPrepared("SELECT TIMESTAMP'2024-01-01 00:00:00' + ? AS t")
    s.bindParams(p.handle, Seq(java.time.Duration.ofHours(25)))
    val out = s.executePrepared(p.handle).head.getTimestamp(0).toString
    assert(out.startsWith("2024-01-02 01:00:00"))
  }
}
