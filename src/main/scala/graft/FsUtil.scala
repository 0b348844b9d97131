package graft

/** Local-filesystem helpers shared by the bench/scratch lifecycles. */
object FsUtil {
  /** Recursive delete; symlinks are deleted as entries, not followed
    * (listFiles on a symlinked dir would follow — callers here only
    * ever point this at directories this process created). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete(); ()
  }
}
