package graft.queries

/** Shared scratch-dir helpers for battery queries that materialize state
  * under `/tmp/graft/<sf>/` (stores, indexes, stream drops). One definition
  * — the per-file private copies had already drifted (exists-guard and
  * parent creation present in some, absent in others).
  */
private[queries] object QueryScratch {

  /** `/tmp/graft/<sf-basename>/<name>` for the given sf directory. */
  def dir(sfDir: String, name: String): String =
    s"/tmp/graft/${java.nio.file.Paths.get(sfDir).getFileName.toString}/$name"

  /** Delete `p` recursively if present and ensure its PARENT exists, so a
    * following write or createDirectories cannot fail on a fresh host.
    */
  def clean(p: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    val f = new java.io.File(p)
    if (f.exists()) rm(f)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent): Unit
  }

  /** [[dir]] + [[clean]] in one call: a fresh scratch path. */
  def fresh(sfDir: String, name: String): String = {
    val p = dir(sfDir, name)
    clean(p)
    p
  }
}
