package graft.harness

import java.util.ServiceLoader
import scala.jdk.CollectionConverters._

/** A runnable job unit with a name, discovered via `ServiceLoader`.
  * Port of the reference's action framework (`Action.java`,
  * `ActionFactory.java`, `FactoryUtil.java`, `FactoryException.java`).
  */
trait Action {
  @throws[Exception]
  def run(): Unit
}

final class FactoryException(message: String) extends RuntimeException(message)

/** Extension point: JVM `ServiceLoader` + `META-INF/services`, exactly the
  * reference's plugin mechanism (`FactoryUtil.java:18-58`).
  */
trait ActionFactory {
  def name: String
  def showHelp(): Unit
  def create(params: Args): Option[Action]

  /** Repeatable `--partition k1=v1,k2=v2` args → one map per occurrence
    * (port of `ActionFactory.java:59-66`).
    */
  def getPartitions(params: Args): List[Map[String, String]] =
    params.getMulti("partition")
      .map(Args.parseCommaSeparatedKeyValues)
      .toList
}

object FactoryUtil {
  /** Lookup by name; errors unless exactly one factory matches
    * (`FactoryUtil.java:23-26`); tolerates `NoClassDefFoundError` during
    * discovery (`FactoryUtil.java:46-55`).
    */
  def discoverActionFactory(classLoader: ClassLoader, name: String): ActionFactory = {
    val matched = discoverServices(classLoader).filter(_.name == name)
    if (matched.size != 1)
      throw new FactoryException(
        s"Error number services for '$name'. expected 1, but ${matched.size} found.")
    matched.head
  }

  def discoverActionNames(classLoader: ClassLoader): List[String] =
    discoverServices(classLoader).map(_.name)

  private def discoverServices(classLoader: ClassLoader): List[ActionFactory] = {
    val it = ServiceLoader.load(classOf[ActionFactory], classLoader).iterator()
    val found = List.newBuilder[ActionFactory]
    var more = true
    while (more) {
      try {
        if (it.hasNext) found += it.next() else more = false
      } catch {
        case _: NoClassDefFoundError => // expected for absent optional impls
        case t: Throwable =>
          throw new RuntimeException(
            "Unexpected error when trying to load service provider.", t)
      }
    }
    found.result()
  }
}

object ActionFactory {
  /** Parse action args, handle `--help`, delegate to the named factory
    * (`ActionFactory.java:24-47`).
    */
  def createAction(args: Array[String]): Option[Action] = {
    val actionName = args(0).toLowerCase.trim
    val factory =
      try FactoryUtil.discoverActionFactory(getClass.getClassLoader, actionName)
      catch {
        case e: FactoryException =>
          showDefaultHelp()
          throw new UnsupportedOperationException(
            s"Unknown action '$actionName'. The root cause is:\n $e")
      }
    val params = Args.fromArgs(args.drop(1))
    if (params.has("help")) {
      factory.showHelp()
      None
    } else factory.create(params)
  }

  def showDefaultHelp(): Unit = {
    println("Usage: <action> [OPTIONS]")
    println()
    println("Available actions:")
    FactoryUtil.discoverActionNames(getClass.getClassLoader)
      .foreach(a => println("  " + a))
    println("For detailed options of each action, run <action> --help")
  }
}

/** CLI entry: arg[0] = action name (port of `FlinkActions.java:11-22`).
  * `spark-submit --class graft.harness.GraftActions engine.jar sql-submit
  * --sql-file f.sql --var k=v`
  */
object GraftActions {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      ActionFactory.showDefaultHelp()
      sys.exit(1)
    }
    ActionFactory.createAction(args) match {
      case Some(action) => action.run()
      case None         => sys.exit(1)
    }
  }
}
