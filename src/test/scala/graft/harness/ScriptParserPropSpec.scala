package graft.harness

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the script pipeline (SURVEY.md §5
  * item 2): random statement bodies and variable maps round-trip
  * through split + substitute + classify.
  */
class ScriptParserPropSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  // statement bodies: keyword + identifier payload, no comments/semicolons
  private val keyword: Gen[String] = Gen.oneOf(
    "SELECT", "CREATE TABLE", "DROP TABLE", "ALTER TABLE", "INSERT INTO",
    "DESC", "SHOW", "USE", "SET", "RESET")
  private val body: Gen[String] = for {
    k <- keyword
    payload <- Gen.listOfN(3, ident).map(_.mkString(" "))
  } yield s"$k $payload"

  test("every generated statement is recovered by the splitter, in order") {
    checkProp(Prop.forAll(Gen.nonEmptyListOf(body)) { bodies =>
      val script = bodies.map(b => s"$b;").mkString("\n")
      val parsed = ScriptParser.parse(script)
      parsed.map(_.sql.trim.replaceAll("\\s+", " ")) ==
        bodies.toVector.map(_.trim.replaceAll("\\s+", " "))
    })
  }

  test("classification of known heads never yields UNKNOWN") {
    checkProp(Prop.forAll(body) { b =>
      StatementType.fromStatement(b) != StatementType.UNKNOWN
    })
  }

  test("variable substitution replaces every placeholder it has a binding for") {
    val kv: Gen[(String, String)] = for {
      k <- ident; v <- ident
    } yield (k, v)
    checkProp(Prop.forAll(Gen.nonEmptyMap(kv)) { vars =>
      val keys = vars.keys.toVector
      val sql = keys.map(k => "${" + k + "}").mkString("SELECT ", ", ", "")
      val out = ScriptParser.substitute(sql, vars)
      !out.contains("${") && keys.forall(k => out.contains(vars(k)))
    })
  }

  test("interleaved full-line comments and blanks never change the statements") {
    checkProp(Prop.forAll(Gen.nonEmptyListOf(body)) { bodies =>
      val plain = ScriptParser.parse(bodies.map(b => s"$b;").mkString("\n"))
      val noisy = ScriptParser.parse(
        bodies.map(b => s"-- comment\n\n$b;\n   \n").mkString("\n"))
      plain.map(_.tpe) == noisy.map(_.tpe) &&
      plain.map(_.sql.trim) == noisy.map(_.sql.trim)
    })
  }

  test("a trailing comment after the terminator suppresses it (reference quirk)") {
    // `SELECT x; -- trailing` strips to `SELECT x; ` which no longer
    // ENDS with ';' — the reference (SQLSubmitAction.java:108-122) then
    // keeps accumulating, so the statement is not emitted on that line.
    val parsed = ScriptParser.parse("SELECT a; -- trailing\n")
    assert(parsed.isEmpty)
  }
}
