package graft.core

/** Session-scratch directories for round-trip queries and side stores:
  * created under the JVM temp root, registered for recursive deletion on
  * exit, so repeated bench/CI sessions never accumulate orphaned data.
  */
object Scratch {

  /** Create a temp directory that is deleted (recursively) on JVM exit. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.Files
      import scala.jdk.CollectionConverters._
      if (Files.exists(d)) {
        val walk = Files.walk(d)
        try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists)
        finally walk.close()
      }
    }))
    d.toString
  }
}
