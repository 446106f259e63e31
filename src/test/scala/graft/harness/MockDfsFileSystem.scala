package graft.harness

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A `mockdfs://` Hadoop filesystem backed by local disk: lets specs
  * exercise the non-`file://` scheme dispatch in
  * [[ScriptParser.loadStatements]] without a namenode.
  */
class MockDfsFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockdfs:///")
  // RawLocalFileSystem insists on file:// paths; any path this FS is
  // handed already resolved through the mockdfs scheme
  override def checkPath(path: Path): Unit = ()
}
