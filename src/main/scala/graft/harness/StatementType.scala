package graft.harness

import scala.util.matching.Regex

/** Statement classifier: first-match against ordered case-insensitive
  * DOTALL regexes, fallthrough UNKNOWN.
  *
  * Mirrors the reference semantics of
  * `flink-actions/.../sql/StatementType.java:5-69` — declaration order is
  * load-bearing: CREATE carries a negative lookahead so that
  * `CREATE ... AS SELECT` falls through to CTAS, and ADD_JAR precedes ADD.
  */
sealed abstract class StatementType(val name: String, regex: String) {
  private val pattern: Regex = ("(?is)" + regex).r
  def matches(statement: String): Boolean =
    pattern.matches(statement)
}

object StatementType {
  case object SELECT   extends StatementType("SELECT", "^SELECT.*")
  case object CREATE   extends StatementType("CREATE", "^CREATE(?!.*AS SELECT).*$")
  case object DROP     extends StatementType("DROP", "^DROP.*")
  case object ALTER    extends StatementType("ALTER", "^ALTER.*")
  case object INSERT   extends StatementType("INSERT", "^INSERT.*")
  case object DESC     extends StatementType("DESC", "^DESC.*")
  case object DESCRIBE extends StatementType("DESCRIBE", "^DESCRIBE.*")
  case object EXPLAIN  extends StatementType("EXPLAIN", "^EXPLAIN.*")
  case object USE      extends StatementType("USE", "^USE.*")
  case object SHOW     extends StatementType("SHOW", "^SHOW.*")
  case object LOAD     extends StatementType("LOAD", "^LOAD.*")
  case object UNLOAD   extends StatementType("UNLOAD", "^UNLOAD.*")
  case object SET      extends StatementType("SET", "^SET.*")
  case object UNSET    extends StatementType("UNSET", "^UNSET.*")
  case object RESET    extends StatementType("RESET", "^RESET.*")
  case object EXECUTE  extends StatementType("EXECUTE", "^EXECUTE.*")
  case object ADD_JAR  extends StatementType("ADD_JAR", "^ADD\\s+JAR\\s+\\S+")
  case object ADD      extends StatementType("ADD", "^ADD\\s+CUSTOMJAR\\s+\\S+")
  case object PRINT    extends StatementType("PRINT", "^PRINT.*")
  case object CTAS     extends StatementType("CTAS", "^CREATE\\s.*AS\\sSELECT.*$")
  case object UNKNOWN  extends StatementType("UNKNOWN", "^UNKNOWN.*")

  /** Declaration order matters (first match wins). */
  val ordered: Vector[StatementType] = Vector(
    SELECT, CREATE, DROP, ALTER, INSERT, DESC, DESCRIBE, EXPLAIN, USE, SHOW,
    LOAD, UNLOAD, SET, UNSET, RESET, EXECUTE, ADD_JAR, ADD, PRINT, CTAS,
    UNKNOWN)

  def fromStatement(statement: String): StatementType =
    ordered.find(_.matches(statement)).getOrElse(UNKNOWN)
}

/** One parsed script statement: its classified type plus raw SQL text. */
final case class Statement(tpe: StatementType, sql: String)
