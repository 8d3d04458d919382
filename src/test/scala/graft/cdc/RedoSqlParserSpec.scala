package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** A12/A17 parser semantics, anchored to OracleSourceConnectorUtils2.java:256-358. */
class RedoSqlParserSpec extends AnyFunSuite {

  test("property: render->parse round-trips arbitrary string/numeric/null values (500 seeds)") {
    val rnd = new Random(7)
    def randomValue(): Option[String] = rnd.nextInt(5) match {
      case 0 => None // SQL NULL
      case 1 => Some(rnd.nextLong().toString)
      case 2 => Some(f"${rnd.nextDouble() * 1e6}%.4f")
      case _ =>
        // strings with the characters that break naive parsers: quotes, doubled quotes,
        // commas, parens, equals, whitespace runs, keywords
        val pool = Seq("'", "''", ",", "(", ")", " = ", "  ", "values", "where", "and",
          "O'Brien", "a\"b", "x")
        Some(Seq.fill(1 + rnd.nextInt(6))(pool(rnd.nextInt(pool.length))).mkString)
    }
    def lit(v: Option[String]): String =
      v.map(s => "'" + s.replace("'", "''") + "'").getOrElse("NULL")
    (1 to 500).foreach { _ =>
      val cols = (1 to 1 + rnd.nextInt(5)).map(i => s"C$i")
      val vals = cols.map(_ => randomValue())
      val insert = cols.map(c => "\"" + c + "\"").mkString(
        "insert into \"S\".\"T\"(", ",", ") values (") +
        vals.map(lit).mkString(",") + ")"
      val p = RedoSqlParser.parse(insert)
      assert(p.operation == "INSERT" && p.data.map(_._1) == cols.toVector)
      assert(p.data.map(_._2) == vals.toVector, s"stmt: $insert")
      // the same values as an UPDATE's WHERE image (numbers render bare, strings quoted)
      val where = cols.zip(vals).map {
        case (c, None)    => "\"" + c + "\" IS NULL"
        case (c, Some(v)) => "\"" + c + "\" = " + lit(Some(v))
      }.mkString(" and ")
      val del = RedoSqlParser.parse(s"""delete from "S"."T" where $where""")
      assert(del.before.map(_._2) == vals.toVector, s"where: $where")
    }
  }

  test("INSERT: data = zip(columns, values), before empty (Utils:274-296)") {
    val p = RedoSqlParser.parse(
      """insert into "HR"."EMP"("ID","NAME","SAL") values (1,'Alice',2500.50)""")
    assert(p.operation == "INSERT" && p.owner == "HR" && p.table == "EMP")
    assert(p.data == Vector("ID" -> Some("1"), "NAME" -> Some("Alice"), "SAL" -> Some("2500.50")))
    assert(p.before.isEmpty)
  }

  test("UPDATE: before = WHERE conjuncts; data = before overlaid with SET (Utils:297-333,389-399)") {
    val p = RedoSqlParser.parse(
      """update "HR"."EMP" set "SAL" = 2600, "BONUS" = 10 where "ID" = 1 and "SAL" = 2500 and "NAME" = 'Alice'""")
    assert(p.before == Vector("ID" -> Some("1"), "SAL" -> Some("2500"), "NAME" -> Some("Alice")))
    // SAL overlaid in place; BONUS (not in WHERE) appended
    assert(p.data == Vector("ID" -> Some("1"), "SAL" -> Some("2600"), "NAME" -> Some("Alice"),
      "BONUS" -> Some("10")))
  }

  test("DELETE: before = WHERE conjuncts, data empty (Utils:335-352)") {
    val p = RedoSqlParser.parse("""delete from "HR"."EMP" where "ID" = 7 and "NAME" = 'Bob'""")
    assert(p.operation == "DELETE")
    assert(p.data.isEmpty)
    assert(p.before == Vector("ID" -> Some("7"), "NAME" -> Some("Bob")))
  }

  test("IS NULL in WHERE treated as = NULL (Utils:268)") {
    val p = RedoSqlParser.parse("""delete from "S"."T" where "A" = 1 and "B" IS NULL""")
    assert(p.before == Vector("A" -> Some("1"), "B" -> None))
  }

  test("NULL literal becomes None (Utils:392,397,405)") {
    val p = RedoSqlParser.parse("""insert into "S"."T"("A","B") values (NULL,'x')""")
    assert(p.data == Vector("A" -> None, "B" -> Some("x")))
  }

  test("doubled single-quote unescaping on by default (Utils:286-292)") {
    val p = RedoSqlParser.parse("""insert into "S"."T"("N") values ('O''Brien')""")
    assert(p.dataMap("N") == "O'Brien")
    val raw = RedoSqlParser.parse("""insert into "S"."T"("N") values ('O''Brien')""", unescape = false)
    assert(raw.dataMap("N") == "O''Brien")
  }

  test("TIMESTAMP/DATE literal prefix stripped (Utils:467-469)") {
    val p = RedoSqlParser.parse(
      """update "S"."T" set "TS" = TIMESTAMP '2020-01-02 03:04:05' where "ID" = 1 and "D" = DATE '2020-01-02'""")
    assert(p.dataMap("TS") == "2020-01-02 03:04:05")
    assert(p.beforeMap("D") == "2020-01-02")
  }

  test("TO_DATE / TO_TIMESTAMP take first argument; EMPTY_CLOB() -> null") {
    val p = RedoSqlParser.parse(
      """insert into "S"."T"("D","C") values (TO_DATE('2020-01-02','YYYY-MM-DD'),EMPTY_CLOB())""")
    assert(p.data == Vector("D" -> Some("2020-01-02"), "C" -> None))
  }

  test("negative numbers and exponent forms") {
    val p = RedoSqlParser.parse("""insert into "S"."T"("A","B") values (-3.5,1.2E-4)""")
    assert(p.dataMap("A") == "-3.5" && p.dataMap("B") == "1.2E-4")
  }

  test("unquoted identifiers and missing owner") {
    val p = RedoSqlParser.parse("insert into T(ID) values (1)")
    assert(p.owner == "" && p.table == "T" && p.dataMap("ID") == "1")
  }

  test("quoted identifiers keep case and special chars") {
    val p = RedoSqlParser.parse("""insert into "s"."Tab le"("Weird""Col") values (1)""")
    assert(p.table == "Tab le" && p.data.head._1 == "Weird\"Col")
  }

  test("non-DML returns None via parseOpt (Thread:305-308 log-and-continue)") {
    assert(RedoSqlParser.parseOpt("create table foo (x number)").isEmpty)
    assert(RedoSqlParser.parseOpt("garbage !!").isEmpty)
    assert(RedoSqlParser.parseOpt("").isEmpty)
  }

  test("out-of-grammar trailing syntax fails to DLQ, never half-parses ok=true") {
    // an OR disjunct: accepting the first conjunct and discarding the rest would delete
    // with a truncated predicate image
    assert(RedoSqlParser.parseOpt("""delete from "HR"."EMP" where "ID" = 1 or "ID" = 2""").isEmpty)
    assert(RedoSqlParser.parseOpt(
      """update "HR"."EMP" set "SAL" = 1 where "ID" = 1 or "ID" = 2""").isEmpty)
    assert(RedoSqlParser.parseOpt(
      """insert into "HR"."EMP"("ID") values (1) returning "ID" into :b0""").isEmpty)
    // well-formed statements still parse to EOF (trailing ; and whitespace are fine)
    assert(RedoSqlParser.parseOpt("""delete from "HR"."EMP" where "ID" = 1 and "X" = 2; """).nonEmpty)
  }

  test("INSERT column/values arity mismatch fails instead of silently truncating") {
    assert(RedoSqlParser.parseOpt("""insert into "T"("A","B","C") values (1,2)""").isEmpty)
    assert(RedoSqlParser.parseOpt("""insert into "T"("A") values (1,2)""").isEmpty)
    val e = intercept[IllegalArgumentException](
      RedoSqlParser.parse("""insert into "T"("A","B","C") values (1,2)"""))
    assert(e.getMessage.contains("arity"))
  }

  private def randomValue(r: Random): Option[String] = r.nextInt(4) match {
    case 0 => None
    case 1 => Some((r.nextLong() % 100000L).toString)
    case 2 => Some(r.alphanumeric.take(1 + r.nextInt(12)).mkString)
    case _ => Some("O'Brien & Co; \"quoted\" " + r.nextInt(10))
  }

  private def randomCols(r: Random): List[(String, Option[String])] =
    (0 to r.nextInt(5)).map(i => (s"C${r.alphanumeric.filter(_.isLetter).take(4).mkString.toUpperCase}_$i",
      randomValue(r))).toList

  private def renderLiteral(v: Option[String]): String = v match {
    case None    => "NULL"
    case Some(s) if s.nonEmpty && s.head != '-' && s.forall(_.isDigit) => s
    case Some(s) if s.nonEmpty && s.head == '-' && s.length > 1 && s.tail.forall(_.isDigit) => s
    case Some(s) => "'" + s.replace("'", "''") + "'"
  }

  test("property: INSERT render -> parse round-trips columns and values (500 seeded cases)") {
    val r = new Random(42)
    for (_ <- 1 to 500) {
      val cols = randomCols(r)
      val sql = cols.map(c => s""""${c._1}"""").mkString(
        """insert into "S"."T"(""", ",", ") values (") +
        cols.map(c => renderLiteral(c._2)).mkString("", ",", ")")
      val p = RedoSqlParser.parse(sql)
      assert(p.data == cols.toVector, s"\nsql=$sql")
    }
  }

  test("property: UPDATE where-overlay semantics (500 seeded cases)") {
    val r = new Random(7)
    for (_ <- 1 to 500) {
      val where = randomCols(r)
      val set = where.head._1 -> Some("NEWVAL")
      val sql = s"""update "S"."T" set "${set._1}" = 'NEWVAL' where """ +
        where.map { case (c, v) =>
          if (v.isEmpty) s""""$c" IS NULL""" else s""""$c" = ${renderLiteral(v)}"""
        }.mkString(" and ")
      val p = RedoSqlParser.parse(sql)
      assert(p.before == where.toVector, s"\nsql=$sql")
      assert(p.data == where.toVector.map { case (c, v) => if (c == set._1) set else (c, v) })
    }
  }
}
