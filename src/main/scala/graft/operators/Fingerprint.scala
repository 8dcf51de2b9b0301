package graft.operators

/** Parquet-metadata corpus fingerprint shared by every persisted
  * artifact key (the ANN index, the text index, the denorm child
  * table, the bucketed join layout): input file names + lengths +
  * mtimes folded into one hex token, so a regenerated corpus changes
  * the key and forces a rebuild instead of a silent stale read.
  * ONE implementation on purpose — the fold used to be copy-pasted
  * per artifact, which is exactly how the text index gained its
  * layout-version path segment while the ANN index initially didn't;
  * any future change to what "corpus version" means now lands on all
  * artifacts at once. */
object Fingerprint {

  def ofTables(sfDir: String, tables: String*): String = {
    val files = tables.toSeq.flatMap { t =>
      val root = new java.io.File(s"$sfDir/$t.parquet")
      if (root.isDirectory) root.listFiles().toSeq.sortBy(_.getName)
      else Seq(root)
    }
    val h = files.foldLeft(1125899906842597L) { (a, f) =>
      ((a * 31 + f.getName.hashCode) * 31 + f.length) * 31 + f.lastModified
    }
    f"${h & Long.MaxValue}%016x"
  }
}
