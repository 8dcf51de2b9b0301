package graft

/** Per-JVM scratch directories with guaranteed cleanup. Every
  * write-path query and streaming source used to call
  * `Files.createTempDirectory` directly and leak the populated
  * directory forever (`deleteOnExit` is a no-op on non-empty dirs) —
  * repeated bench/verify passes accumulated full dataset copies until
  * /tmp filled. One shutdown hook walks every directory handed out
  * here and deletes it recursively; while the JVM lives, the dirs are
  * stable (streaming checkpoints and artifact builds re-read them). */
object Scratch {

  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { d =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p =>
              try java.nio.file.Files.deleteIfExists(p)
              catch { case _: java.io.IOException => () })
        } catch { case _: java.io.IOException => () }
      }
    }))
    true
  }

  /** A fresh scratch directory, removed recursively at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val d = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(d)
    d.toString
  }
}
