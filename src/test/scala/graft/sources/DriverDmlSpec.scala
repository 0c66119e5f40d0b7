package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver-side small-batch DML fast path (VERDICT r15 #3) must be a
  * pure LATENCY optimization: same results, same errors, same manifest
  * semantics as the planned Spark path, with every gate falling back
  * instead of diverging. Parity is pinned here value-by-value.
  */
class DriverDmlSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def mk(pk: Option[String] = Some("id")) = {
    val dir = Files.createTempDirectory("graft_ddml").resolve("t").toString
    MutableTable.create(spark, dir, schema, pk)
  }

  private def rowsDf(data: (Long, String, Double)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(d => Row(d._1, d._2, d._3)), 1), schema)

  // === VALUES literal parsing ===============================================

  test("parseValues: literals, escapes, negatives, exponents, NULL/TRUE/FALSE") {
    assert(DriverDml.parseValues("(1, 'a', 2.5)") ==
      Some(Seq(Seq(1L, "a", 2.5))))
    assert(DriverDml.parseValues("(1,'x''y'), (-2, NULL)") ==
      Some(Seq(Seq(1L, "x'y"), Seq(-2L, null))))
    // Spark-parser escape semantics: \\ is one backslash, \n a newline —
    // the exact text SqlParams.literal produces for "C:\new"
    assert(DriverDml.parseValues("""(1, 'C:\\new')""") ==
      Some(Seq(Seq(1L, "C:\\new"))))
    assert(DriverDml.parseValues("""(1, 'a\nb\t''q')""") ==
      Some(Seq(Seq(1L, "a\nb\t'q"))))
    // exotic escapes bail to the planned parser
    assert(DriverDml.parseValues("(1, '" + '\\' + "u0041')").isEmpty)
    assert(DriverDml.parseValues("""(1, 'x\Z')""").isEmpty)
    assert(DriverDml.parseValues("(1e3, -2.5E-1, TRUE, false)") ==
      Some(Seq(Seq(1000.0, -0.25, true, false))))
    // anything non-literal falls back
    assert(DriverDml.parseValues("(1 + 2)").isEmpty)
    assert(DriverDml.parseValues("(upper('a'))").isEmpty)
    assert(DriverDml.parseValues("(CAST(1 AS INT))").isEmpty)
    assert(DriverDml.parseValues("").isEmpty)
    assert(DriverDml.parseValues("(1,), (2)").isEmpty) // malformed
    assert(DriverDml.parseValues("(1), ").isEmpty) // trailing comma
  }

  test("parseValues inverts SqlParams.literal for arbitrary rows (the exact wire path)") {
    import org.scalacheck.Gen
    // the driver-side insert fast path consumes EXACTLY the text
    // SqlParams.bind produces for prepared params — the parser must be
    // the literal() escaper's inverse for every representable value.
    // Strings are biased toward backslash/quote clusters (the historical
    // corruption shapes) plus non-ASCII.
    val str: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('\\', '\'', '"'),
      1 -> Gen.oneOf('\n', '\r', '\t', '\b'),
      1 -> Gen.oneOf('é', '中', 'ß'))).map(_.mkString)
    val finiteDouble = Gen.chooseNum(-1e12, 1e12).suchThat(d => !d.isNaN && !d.isInfinite)
    val value: Gen[Any] = Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(l => l: Any),
      finiteDouble.map(d => d: Any),
      str.map(s => s: Any),
      Gen.oneOf(true, false).map(b => b: Any),
      Gen.const(null: Any))
    val rows = Gen.nonEmptyListOf(Gen.nonEmptyListOf(value).map(_.take(6))).map(_.take(4))
    (0 until 300).foreach { _ =>
      rows.sample.foreach { rs =>
        val text = rs.map(r => r.map(graft.SqlParams.literal).mkString("(", ", ", ")"))
          .mkString(", ")
        val parsed = DriverDml.parseValues(text)
        assert(parsed.isDefined, s"parser rejected literal() output: $text")
        assert(parsed.get.map(_.toList) == rs.map(_.toList),
          s"round-trip diverged for $text")
      }
    }
  }

  test("coerce: natural representations only; lossy shapes decline") {
    assert(DriverDml.coerce(5L, LongType) == Some(5L))
    assert(DriverDml.coerce(5L, IntegerType) == Some(5))
    assert(DriverDml.coerce(Long.MaxValue, IntegerType).isEmpty) // overflow
    assert(DriverDml.coerce(5L, DoubleType) == Some(5.0))
    assert(DriverDml.coerce(2.5, FloatType) == Some(2.5f))
    assert(DriverDml.coerce("x", StringType) == Some("x"))
    assert(DriverDml.coerce(2.5, LongType).isEmpty) // truncation -> planned cast
    assert(DriverDml.coerce(5L, StringType).isEmpty) // cross-kind -> planned cast
    assert(DriverDml.coerce(null, LongType) == Some(null))
  }

  // === codec round-trip =====================================================

  test("writeRows/readRows round-trip all supported types incl. nulls") {
    val s = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType)))
    val dir = Files.createTempDirectory("graft_codec")
    val file = dir.resolve("t.parquet")
    val in = Seq(
      Array[Any](1L, 2, 3.5, 4.5f, true, "héllo"),
      Array[Any](null, null, null, null, null, null),
      Array[Any](-9L, -8, -0.0, 0.0f, false, ""))
    DriverDml.writeRows(file, s, in)
    val out = DriverDml.readRows(file, s).get
    assert(out.map(_.toSeq) == in.map(_.toSeq))
    // Spark reads the driver-written file identically (same physical types)
    val viaSpark = spark.read.schema(s).parquet(file.toString)
      .orderBy(col("l").asc_nulls_last).collect()
    assert(viaSpark.length == 3 && viaSpark(0).getLong(0) == -9L)
    // and footer stats decode with the right kinds
    val st = FileStats.fromFooter(file)
    assert(st("l").kind == 'L' && st("s").kind == 'S' && st("d").kind == 'D')
    assert(st("l").min.contains("-9") && st("l").max.contains("1"))
  }

  // === insert fast path =====================================================

  test("insertRowsDirect: append, pk in-batch dup, clash vs table, unsupported schema") {
    val t = mk()
    assert(t.insertRowsDirect(Seq(Array[Any](1L, "a", 1.0), Array[Any](2L, "b", 2.0))) == Some(2L))
    assert(t.df.count() == 2)
    // in-batch duplicate: error, nothing committed
    val v = t.currentVersion
    val dup = intercept[Exception](
      t.insertRowsDirect(Seq(Array[Any](9L, "x", 0.0), Array[Any](9L, "y", 0.0))))
    assert(dup.getMessage.contains("duplicate key in batch"))
    assert(t.currentVersion == v && t.df.count() == 2)
    // clash against committed rows (bounds overlap -> planned check)
    val clash = intercept[Exception](t.insertRowsDirect(Seq(Array[Any](1L, "z", 0.0))))
    assert(clash.getMessage.contains("violates primary key"))
    assert(t.df.count() == 2)
    // -0.0 vs 0.0 double pk in one batch clashes (grouping semantics)
    val dblSchema = StructType(Seq(StructField("d", DoubleType), StructField("k", LongType)))
    val td = MutableTable.create(spark,
      Files.createTempDirectory("graft_ddml").resolve("d").toString, dblSchema, Some("d"))
    val zz = intercept[Exception](
      td.insertRowsDirect(Seq(Array[Any](0.0, 1L), Array[Any](-0.0, 2L))))
    assert(zz.getMessage.contains("duplicate key in batch"))
    // unsupported schema (timestamp) declines, no side effects
    val ts = StructType(Seq(StructField("t", TimestampType)))
    val tt = MutableTable.create(spark,
      Files.createTempDirectory("graft_ddml").resolve("ts").toString, ts, None)
    assert(tt.insertRowsDirect(Seq(Array[Any](null))).isEmpty)
    assert(tt.df.count() == 0)
  }

  test("parseValuesAligned: explicit column lists NULL-fill like BatchAlign; mismatches decline") {
    val s = schema // (id LONG, name STRING, score DOUBLE)
    // full-width, schema order
    val full = DriverDml.parseValuesAligned("(1, 'a', 2.5)", s, None).get
    assert(full.head.toSeq == Seq(1L, "a", 2.5))
    // explicit subset, reordered + case-insensitive: unfed column nulls
    val sub = DriverDml.parseValuesAligned("('x', 7)", s, Some(Seq("NAME", "id"))).get
    assert(sub.head.toSeq == Seq(7L, "x", null))
    // width mismatch, unknown column, duplicate column: decline
    assert(DriverDml.parseValuesAligned("(1)", s, None).isEmpty)
    assert(DriverDml.parseValuesAligned("(1)", s, Some(Seq("nope"))).isEmpty)
    assert(DriverDml.parseValuesAligned("(1, 2)", s, Some(Seq("id", "id"))).isEmpty)
    // unrepresentable literal for the column type: decline (planned cast)
    assert(DriverDml.parseValuesAligned("('5', 'a', 1.0)", s, None).isEmpty)
  }

  // === update/delete fast path parity =======================================

  test("driver rewrite parity: UPDATE/DELETE match Spark filter semantics") {
    val t = mk()
    t.insert(rowsDf((1L, "a", 1.0), (2L, "b", 2.0), (3L, null, 3.0)))
    // point update (the YCSB shape): literal SET, equality WHERE
    assert(t.update(expr("id = 2"), Map("name" -> expr("'upd'"))) == 1L)
    assert(t.df.filter("id = 2").head().getString(1) == "upd")
    assert(t.df.count() == 3)
    // NULL-valued column in the predicate: `name = 'a'` is NULL for the
    // null row — matched rows only where TRUE (three-valued logic)
    assert(t.update(expr("name = 'a'"), Map("score" -> expr("99.5"))) == 1L)
    assert(t.df.filter("id = 1").head().getDouble(2) == 99.5)
    // delete with a range predicate keeps cond-NULL rows (id IS NOT NULL
    // here, so just the range check)
    assert(t.delete(expr("id >= 3")) == 1L)
    assert(t.df.count() == 2)
    // SET to NULL folds and applies
    assert(t.update(expr("id = 1"), Map("name" -> expr("NULL"))) == 1L)
    assert(t.df.filter("id = 1").head().isNullAt(1))
    // update matching nothing: no version bump beyond the no-op contract
    assert(t.update(expr("id = 1000"), Map("name" -> expr("'x'"))) == 0L)
  }

  test("IN-list point deletes ride the driver rewrite (batch-delete shape)") {
    val t = mk()
    t.insert(rowsDf((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    val before = t.driverRewriteHits.get()
    assert(t.delete(expr("id IN (2, 4, 99)")) == 2L)
    assert(t.driverRewriteHits.get() == before + 1,
      "the IN-list delete must take the in-process rewrite, not the planned path")
    assert(t.df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // NOT IN keeps three-valued semantics through the same path
    t.insert(rowsDf((5L, null, 5.0)))
    assert(t.delete(expr("name NOT IN ('a')")) == 1L) // only 'c'; NULL name survives
    assert(t.df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
  }

  test("driver rewrite gates: non-foldable SET and coercing predicates fall back, same results") {
    val t = mk()
    t.insert(rowsDf((1L, "a", 1.0), (2L, "b", 2.0)))
    // non-foldable assignment (references a column) -> planned path
    assert(t.update(expr("id = 1"), Map("name" -> expr("concat(name, '!')"))) == 1L)
    assert(t.df.filter("id = 1").head().getString(1) == "a!")
    // predicate needing analyzer coercion (string col = int) -> planned
    // path; result matches a Spark filter exactly (fresh table: every
    // name must be castable under ANSI semantics)
    val t2 = mk()
    t2.insert(rowsDf((10L, "042", 0.0), (11L, "42", 0.0), (12L, "7", 0.0)))
    val sparkSem = t2.df.filter(expr("name = 42")).count()
    assert(sparkSem == 2L)
    assert(t2.delete(expr("name = 42")) == sparkSem)
    assert(t2.df.count() == 3 - sparkSem)
  }

  test("micro-compaction: tiny files merge inside the insert commit; data and time travel intact") {
    val t = mk()
    (1 to 20).foreach { i =>
      assert(t.insertRowsDirect(Seq(Array[Any](i.toLong, s"n$i", i.toDouble))) == Some(1L))
    }
    // 16 tiny files triggered at least one merge: live count well below 20
    assert(t.fileCount < 16, s"got ${t.fileCount} files")
    assert(t.df.count() == 20)
    assert(t.df.agg(sum("id")).head().getLong(0) == 210L)
    // pk enforcement still holds across the compacted file
    val clash = intercept[Exception](t.insertRowsDirect(Seq(Array[Any](7L, "dup", 0.0))))
    assert(clash.getMessage.contains("violates primary key"))
    // an old snapshot still reads its original (pre-compaction) file set
    assert(t.asOf(5).count() == 5)
  }

  test("insertRowsDirect files prune like Spark-written ones (stats parity)") {
    val t = mk(pk = None)
    assert(t.insertRowsDirect(Seq(Array[Any](1L, "aa", 1.0), Array[Any](5L, "mm", 5.0))) == Some(2L))
    assert(t.insertRowsDirect(Seq(Array[Any](100L, "zz", 9.0))) == Some(1L))
    assert(t.candidateFiles(t.currentVersion, expr("id = 100")).size == 1)
    assert(t.candidateFiles(t.currentVersion, expr("id = 50")).isEmpty)
    assert(t.candidateFiles(t.currentVersion, expr("name LIKE 'a%'")).size == 1)
  }
}
