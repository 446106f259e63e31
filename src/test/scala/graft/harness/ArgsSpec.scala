package graft.harness

import org.scalatest.funsuite.AnyFunSuite

class ArgsSpec extends AnyFunSuite {

  test("parses --key value pairs and repeatable keys") {
    val a = Args.fromArgs(Array(
      "--sql-file", "f.sql", "--var", "a=1", "--var", "b=2"))
    assert(a.get("sql-file").contains("f.sql"))
    assert(a.getMulti("var") == Seq("a=1", "b=2"))
    assert(a.configMap("var") == Map("a" -> "1", "b" -> "2"))
  }

  test("bare flags have empty value; has() sees them") {
    val a = Args.fromArgs(Array("--help"))
    assert(a.has("help"))
    assert(a.get("help").contains(""))
  }

  test("required missing key raises with help pointer") {
    val a = Args.fromArgs(Array("--x", "1"))
    val e = intercept[IllegalArgumentException](a.required("sql-file"))
    assert(e.getMessage.contains("'sql-file' is required"))
  }

  test("value split on first '=' only; comma-separated kv") {
    assert(Args.parseCommaSeparatedKeyValues("a=1,b=x=y") ==
      Map("a" -> "1", "b" -> "x=y"))
    intercept[IllegalArgumentException](
      Args.parseCommaSeparatedKeyValues("noequals"))
  }

  test("non-dashed token is an error") {
    intercept[IllegalArgumentException](Args.fromArgs(Array("oops")))
  }

  test("getPartitions: one map per --partition occurrence") {
    val factory = new SqlSubmitActionFactory
    val a = Args.fromArgs(Array(
      "--partition", "dt=2024-01-01,hr=01", "--partition", "dt=2024-01-02"))
    assert(factory.getPartitions(a) == List(
      Map("dt" -> "2024-01-01", "hr" -> "01"), Map("dt" -> "2024-01-02")))
  }
}
