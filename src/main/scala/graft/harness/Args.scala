package graft.harness

import scala.collection.mutable

/** Multi-value CLI argument parser: `--key value` pairs with repeatable
  * keys (`--var a=1 --var b=2`), plus bare flags (`--help`).
  *
  * A ~40-LoC port of the surface the reference consumes from Flink's
  * `MultipleParameterTool` (`ActionFactory.java:38-41,59-108`).
  */
final class Args private (val multi: Map[String, Seq[String]]) {
  def has(key: String): Boolean = multi.contains(key)

  /** Last value wins for single-value access. */
  def get(key: String): Option[String] = multi.get(key).flatMap(_.lastOption)

  def getMulti(key: String): Seq[String] = multi.getOrElse(key, Seq.empty)

  def required(key: String): String =
    get(key).getOrElse(throw new IllegalArgumentException(
      s"Argument '$key' is required. Run '<action> --help' for help."))

  /** `--key a=1 --key b=2` (and `a=1,b=2`) → Map(a->1, b->2). */
  def configMap(key: String): Map[String, String] =
    getMulti(key).foldLeft(Map.empty[String, String]) { (acc, kvString) =>
      acc ++ Args.parseCommaSeparatedKeyValues(kvString)
    }
}

object Args {
  def fromArgs(args: Array[String]): Args = {
    val m = mutable.LinkedHashMap.empty[String, Vector[String]]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val key = a.drop(2)
        if (key.isEmpty)
          throw new IllegalArgumentException(s"The input $a contains an empty argument")
        val hasValue = i + 1 < args.length && !args(i + 1).startsWith("--")
        val value = if (hasValue) { i += 1; args(i) } else ""
        m.updateWith(key) {
          case Some(vs) => Some(vs :+ value)
          case None     => Some(Vector(value))
        }
      } else if (a.startsWith("-")) {
        val key = a.drop(1)
        val hasValue = i + 1 < args.length && !args(i + 1).startsWith("-")
        val value = if (hasValue) { i += 1; args(i) } else ""
        m.updateWith(key) {
          case Some(vs) => Some(vs :+ value)
          case None     => Some(Vector(value))
        }
      } else {
        throw new IllegalArgumentException(
          s"Error parsing arguments '${args.mkString(" ")}' on '$a'. Please prefix keys with -- or -.")
      }
      i += 1
    }
    new Args(m.toMap)
  }

  /** `"a=1,b=2"` → map; split each entry on the FIRST `=` only
    * (`ActionFactory.java:91-108`).
    */
  def parseCommaSeparatedKeyValues(keyValues: String): Map[String, String] =
    keyValues.split(",").foldLeft(Map.empty[String, String]) { (acc, kv) =>
      parseKeyValueString(acc, kv)
    }

  def parseKeyValueString(map: Map[String, String], kvString: String): Map[String, String] = {
    val kv = kvString.split("=", 2)
    if (kv.length != 2)
      throw new IllegalArgumentException(
        s"Invalid key-value string '$kvString'. Please use format 'key=value'")
    map + (kv(0).trim -> kv(1).trim)
  }
}
