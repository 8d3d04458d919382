package graft.functions

import org.apache.spark.sql.functions.{call_function, col}
import org.scalatest.funsuite.AnyFunSuite

/** Native parse_redo expression + SparkSessionExtensions registration. */
class ParseRedoExprSpec extends AnyFunSuite {

  test("parse_redo is callable from SQL and DataFrame API, matches the UDF path") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      """insert into "HR"."EMP"("ID","NAME") values (1,'O''Brien')""",
      """update "HR"."EMP" set "SAL" = 2600 where "ID" = 1""",
      """delete from "HR"."EMP" where "ID" = 2""",
      "not sql at all").toDF("sql_redo")

    // DataFrame API via call_function -> native expression
    val native = df.select(call_function("parse_redo", col("sql_redo")).as("p"))
      .select($"p.operation", $"p.data", $"p.before", $"p.ok").collect()
    assert(native(0).getString(0) == "INSERT")
    assert(native(0).getAs[Map[String, String]](1) == Map("ID" -> "1", "NAME" -> "O'Brien"))
    assert(native(1).getAs[Map[String, String]](1) == Map("ID" -> "1", "SAL" -> "2600"))
    assert(native(1).getAs[Map[String, String]](2) == Map("ID" -> "1"))
    assert(native(2).getString(0) == "DELETE" && native(2).getBoolean(3))
    assert(!native(3).getBoolean(3))

    // SQL surface
    df.createOrReplaceTempView("redo_in")
    val viaSql = spark.sql(
      "SELECT parse_redo(sql_redo).data['NAME'] AS n FROM redo_in WHERE parse_redo(sql_redo).operation = 'INSERT'")
      .collect()
    assert(viaSql.map(_.getString(0)).toList == List("O'Brien"))

    // ParseRedo.parse routes to the same native expression (lazy registry registration)
    val viaParseRedo = df.select(graft.cdc.ParseRedo.parse(col("sql_redo")).as("p"))
      .select($"p.operation", $"p.data", $"p.before", $"p.ok").collect()
    assert(native.map(_.toString).toList == viaParseRedo.map(_.toString).toList)
  }

  test("SQL-NULL values are explicit null-valued map entries, not omitted (ADVICE r4)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      """update "HR"."EMP" set "BONUS" = NULL where "ID" = 1""",
      """insert into "HR"."EMP"("ID","BONUS") values (2,NULL)""").toDF("sql_redo")
    val out = df.select(call_function("parse_redo", col("sql_redo")).as("p"))
      .select($"p.data").collect()
    val upd = out(0).getAs[Map[String, String]](0)
    // key present (SET to NULL is distinguishable from untouched), value null
    assert(upd.keySet == Set("ID", "BONUS") && upd("BONUS") == null && upd("ID") == "1")
    val ins = out(1).getAs[Map[String, String]](0)
    assert(ins.keySet == Set("ID", "BONUS") && ins("BONUS") == null)
  }
}
