package graft.harness

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.collection.mutable
import scala.util.matching.Regex

/** SQL-script loader: comment stripping, statement splitting, `${var}`
  * substitution, classification.
  *
  * Reproduces the reference's exact line-based semantics
  * (`SQLSubmitAction.java:101-161`), including its deliberate quirks:
  *   - everything from the first `--` to end-of-line is stripped, even
  *     inside string literals (`SQLSubmitAction.java:108-115`);
  *   - a statement terminates only when a line ENDS with `;`
  *     (`SQLSubmitAction.java:122`); a mid-line `;` followed by text does
  *     not terminate;
  *   - the accumulated statement is cut at the FIRST `;` occurrence
  *     (`SQLSubmitAction.java:123-124`);
  *   - a `${key}` with no binding raises (`SQLSubmitAction.java:151-155`).
  */
object ScriptParser {

  private val VarPattern: Regex = raw"\$$\{(.+?)}".r
  private val DoubleDash = "--"
  private val Semicolon = ";"

  /** Parse raw script text into classified statements. */
  def parse(script: String, variables: Map[String, String] = Map.empty): Vector[Statement] = {
    val out = Vector.newBuilder[Statement]
    val buf = new mutable.StringBuilder
    script.linesIterator.foreach { raw =>
      var line = raw
      // process comments: strip from the first `--` to end of line
      val dashIndex = line.indexOf(DoubleDash)
      if (dashIndex >= 0) {
        line = if (dashIndex == 0) "" else line.substring(0, dashIndex)
      }
      if (line.trim.nonEmpty) {
        buf.append(line).append("\n")
        if (line.endsWith(Semicolon)) {
          val orig = buf.toString
          // extension beyond the reference parser: an EXECUTE STATEMENT
          // SET block contains inner semicolons and closes with END; —
          // accumulate until then (the reference's line-based splitter
          // cannot express statement sets at all)
          val isBlock = raw"(?is)^\s*EXECUTE\s+STATEMENT\s+SET.*".r.matches(orig)
          // the block closes when the line ENDS with END; (covers both a
          // standalone END; line and a single-line statement set)
          val closesBlock = line.trim.toUpperCase.endsWith("END;")
          if (isBlock && !closesBlock) {
            // keep accumulating the block
          } else {
            val cut = if (isBlock) orig.lastIndexOf(Semicolon) else orig.indexOf(Semicolon)
            val statement = orig.substring(0, cut)
            out += classify(substitute(statement, variables))
            buf.clear()
          }
        }
      }
    }
    out.result()
  }

  /** `${key}` → value; empty/missing binding is an error
    * (`SQLSubmitAction.java:144-161`).
    */
  def substitute(sql: String, variables: Map[String, String]): String =
    VarPattern.replaceAllIn(sql, m => {
      val key = m.group(1)
      val value = variables.getOrElse(key, "")
      if (value == null || value.isEmpty)
        throw new IllegalArgumentException(
          s"Missing variable value for key '$key'. " +
            s"Please use option '--var $key=<VALUE>' to offer variable values.")
      Regex.quoteReplacement(value)
    })

  def classify(sql: String): Statement =
    Statement(StatementType.fromStatement(sql), sql)

  /** Load + parse a script from `file://` or `hdfs://` (or any Hadoop FS
    * scheme — one code path, unlike the reference's two-way branch at
    * `SQLSubmitAction.java:163-186`; the FS API dispatches on scheme).
    */
  def loadStatements(
      filePath: String,
      variables: Map[String, String] = Map.empty,
      hadoopConf: Configuration = new Configuration()): Vector[Statement] = {
    val uri =
      if (filePath.contains("://")) new URI(filePath)
      else new URI("file://" + new java.io.File(filePath).getAbsolutePath)
    val fs = FileSystem.get(uri, hadoopConf)
    val path = new Path(uri)
    if (!fs.exists(path))
      throw new IllegalArgumentException(s"File $path dose not exists.")
    val reader = new BufferedReader(new InputStreamReader(fs.open(path)))
    try {
      val text = Iterator.continually(reader.readLine())
        .takeWhile(_ != null).mkString("\n")
      parse(text, variables)
    } finally reader.close()
  }
}
