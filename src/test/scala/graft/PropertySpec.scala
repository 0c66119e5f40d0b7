package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY §5: "we add ScalaCheck for type
  * round-trips & batch alignment") over the pure layers: ticket codec,
  * parameter escaping, statement splitting, and the type bridge.
  */
class PropertySpec extends AnyFunSuite {

  /** Minimal forAll: sample the generator N times (scalatestplus bridge
    * is not in the offline cache; raw sampling keeps the properties).
    */
  private def forAll[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.sample.foreach(check)
    }

  private def forAll2(ga: Gen[Int], gb: Gen[Int])(check: (Int, Int) => Unit): Unit =
    (0 until 200).foreach { _ =>
      for (a <- ga.sample; b <- gb.sample) check(a, b)
    }

  test("ticket codec round-trips arbitrary tickets") {
    val gen = for {
      version <- Gen.chooseNum(0, 1 << 20)
      kind <- Gen.chooseNum(0, 3)
      handle <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
      sql <- Gen.option(Gen.asciiPrintableStr)
      rows <- Gen.option(Gen.oneOf(true, false))
    } yield TicketCodec.Ticket(version, kind, handle, sql, rows)
    forAll(gen) { t =>
      assert(TicketCodec.decode(TicketCodec.encode(t)) == t)
    }
  }

  test("SqlParams.literal escaping survives any string content") {
    forAll(Gen.asciiPrintableStr) { s =>
      val lit = SqlParams.literal(s)
      assert(lit.startsWith("'") && lit.endsWith("'"))
      // un-escaping (reverse order of escaping) recovers the original
      assert(lit.substring(1, lit.length - 1)
        .replace("''", "'").replace("\\\\", "\\") == s)
    }
  }

  test("splitStatements never loses non-empty content and rejoins cleanly") {
    val stmt = Gen.nonEmptyListOf(Gen.oneOf(
      "SELECT 1", "INSERT INTO t VALUES (';')", "CREATE TABLE x (a INT)",
      "SELECT * FROM t WHERE s = 'a;b'", "-- note\nSELECT 2"))
    forAll(stmt) { parts =>
      val script = parts.mkString("; ")
      val split = SqlShim.splitStatements(script)
      assert(split.length == parts.length, s"script: $script")
    }
  }

  test("type bridge round-trips every Spark type it can name") {
    import org.apache.spark.sql.types._
    val base = Gen.oneOf[DataType](LongType, IntegerType, ShortType, ByteType, StringType,
      BooleanType, DoubleType, FloatType, DateType, TimestampNTZType, TimestampType,
      BinaryType, DecimalType(10, 2), DecimalType(38, 0))
    val gen = Gen.oneOf(base, base.map(ArrayType(_)), base.map(t => ArrayType(ArrayType(t))))
    forAll(gen) { dt =>
      assert(TypeBridge.toSpark(TypeBridge.toDuckName(dt)) == dt)
    }
  }

  test("decimal parsing honors precision caps for arbitrary (p, s)") {
    forAll2(Gen.chooseNum(1, 76), Gen.chooseNum(0, 38)) { (p, s0) =>
      val s = math.min(s0, p)
      val dt = TypeBridge.toSpark(s"DECIMAL($p,$s)").asInstanceOf[org.apache.spark.sql.types.DecimalType]
      assert(dt.precision <= 38 && dt.scale <= dt.precision)
    }
  }

  test("parseInsert round-trips arbitrary identifiers and column lists") {
    val bare = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))
    val weird = Gen.oneOf("we ird", "a.b", "x`y", "q\"t", "1st", "select")
    val ident = Gen.oneOf(bare, weird)
    val gen = for {
      parts <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, ident))
      cols <- Gen.option(Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, bare)))
      kw <- Gen.oneOf("VALUES (?, ?)", "SELECT 1, 2", "values(?,?)")
    } yield (parts, cols, kw)
    forAll(gen) { case (parts, cols, kw) =>
      // quote every part with backticks — parseInsert must unquote back
      val table = parts.map(p => "`" + p.replace("`", "``") + "`").mkString(".")
      val colSql = cols.map(_.mkString("(", ", ", ") ")).getOrElse("")
      val sql = s"INSERT INTO $table $colSql$kw"
      val parsed = SqlShim.parseInsert(sql)
      assert(parsed.isDefined, s"failed to parse: $sql")
      assert(parsed.get._1 == parts, s"table parts mangled for: $sql")
      assert(parsed.get._2 == cols, s"column list mangled for: $sql")
    }
  }

  test("insertSourceIsPureParams accepts only placeholder-only VALUES") {
    // any expression fragment mixed into VALUES must disqualify the
    // appender fast path (values would be silently dropped otherwise)
    val exprFrag = Gen.oneOf("1", "upper(?)", "'x'", "? + 1", "now()")
    forAll(exprFrag) { frag =>
      assert(!SqlShim.insertSourceIsPureParams(s"INSERT INTO t VALUES (?, $frag)"))
    }
    val pureShape = Gen.chooseNum(1, 5).flatMap(w =>
      Gen.chooseNum(1, 4).map(r => (w, r)))
    forAll(pureShape) { case (w, r) =>
      val tuple = Seq.fill(w)("?").mkString("(", ", ", ")")
      val sql = s"INSERT INTO t VALUES ${Seq.fill(r)(tuple).mkString(", ")}"
      assert(SqlShim.insertSourceIsPureParams(sql), sql)
    }
  }
}
