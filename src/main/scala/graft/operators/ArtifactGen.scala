package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Generation-directory + pointer lifecycle for persisted ingest
  * artifacts ([[TextIndex]], [[AnnIndex]]) — the same
  * versioned-dir-behind-an-atomic-alias discipline as
  * [[graft.sources.Sink.aliasSwap]] (ES's index-alias swap, s14).
  *
  * Why: a rebuild that writes `mode("overwrite")` INTO the directory a
  * live reader's `Loaded` points at serves that reader a MIX of old
  * and new files mid-rebuild. With generations, every (re)build goes
  * to a FRESH `gen-N` subdirectory and only then is the `_CURRENT`
  * pointer atomically moved onto it: a stale reader keeps its old
  * generation untouched (wholly-old), a new reader resolves the
  * pointer to the completed build (wholly-new), and no reader can
  * observe a half-written artifact. In-place segment APPENDS within a
  * generation remain the owner's business (that is the Lucene segment
  * model); what generations guarantee is that REBUILDS never mutate a
  * directory anyone already holds.
  *
  * Layout under `root/` (one root per corpus-version key):
  *   gen-1/ gen-2/ ...   artifact generations, each `_DONE`-marked by
  *                       its builder when complete
  *   _CURRENT            pointer file naming the live generation,
  *                       replaced via write-tmp + ATOMIC_MOVE
  *
  * Old generations are retained (bounded: one new generation per
  * invalidation event, which is rare); at scale a janitor deletes
  * generations older than the previous one once their readers drain —
  * the standard alias-swap GC.
  */
object ArtifactGen {

  /** The live generation: `_CURRENT`'s target, but only if that
    * generation finished building (`_DONE`) — a pointer at a torn or
    * invalidated generation reads as "no live artifact, rebuild". */
  def currentDir(root: Path): Option[Path] =
    if (!Files.exists(root.resolve("_CURRENT"))) None
    else {
      val gen = new String(
        Files.readAllBytes(root.resolve("_CURRENT")), "UTF-8").trim
      val dir = root.resolve(gen)
      if (Files.exists(dir.resolve("_DONE"))) Some(dir) else None
    }

  /** A fresh generation directory name that collides with nothing on
    * disk — max existing gen number + 1, so a build that completed but
    * died before publishing is never half-overwritten. */
  def nextGenDir(root: Path): Path = {
    Files.createDirectories(root)
    // Files.list keeps a DirectoryStream open until closed — an
    // unclosed stream leaks one fd per ensure() miss
    val listing = Files.list(root)
    val existing =
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("gen-") =>
          s.stripPrefix("gen-").toIntOption.getOrElse(0)
        }
        .foldLeft(0)(math.max)
      finally listing.close()
    root.resolve(s"gen-${existing + 1}")
  }

  /** Recursive delete (deepest-first), stream closed — the shared
    * lifecycle-reset helper for specs and the s15 gated replay. */
  def wipe(root: Path): Unit =
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      val paths =
        try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        finally walk.close()
      paths.foreach(p => Files.deleteIfExists(p))
    }

  /** The shared resolve-or-build body of every managed `ensure()`:
    * resolve `_CURRENT` to a completed generation and `load` it, else
    * `build` into a FRESH generation and publish it. One
    * implementation for all three artifact families (text, vector,
    * dedup) so a lifecycle fix is single-site — the per-family
    * objects keep only their memo and their table readers. */
  def resolveOrBuild[L](root: Path, load: String => L,
                        build: String => L): L =
    currentDir(root) match {
      case Some(gen) => load(gen.toString)
      case None =>
        val gen = nextGenDir(root)
        val built = build(gen.toString)
        publish(root, gen)
        built
    }

  /** Point `_CURRENT` at `gen` — write-to-tmp + ATOMIC_MOVE, the
    * aliasSwap pattern: readers resolve either the old pointer or the
    * new one, never a partial write. */
  def publish(root: Path, gen: Path): Unit = {
    val tmp = Files.createTempFile(root, "_current", ".tmp")
    Files.write(tmp, gen.getFileName.toString.getBytes("UTF-8"))
    Files.move(tmp, root.resolve("_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
