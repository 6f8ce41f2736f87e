package graft

import java.nio.file.{Files, Path}

/** The one recursive-delete used everywhere a query or sink cleans its
  * scratch directories — previously five near-identical walk-and-delete
  * copies (ServingSink ×2, PartitionedServingSink, OperatorQueries,
  * MergeSpec); a fix here (symlinks, retries) now propagates.
  */
object Fs {

  /** Delete `dir` recursively (children before parents); missing paths
    * are a no-op. Walk streams are closed; deletions are best-effort
    * idempotent (`deleteIfExists`).
    */
  def rmTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      val tree = Files.walk(dir)
      try tree.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally tree.close()
    }

  def rmTree(dir: String): Unit = rmTree(java.nio.file.Paths.get(dir))

  /** Publish rename for store commits: ATOMIC_MOVE so a filesystem where
    * rename degrades to copy+delete FAILS FAST instead of silently
    * tearing the published unit (ADVICE r9). All segment/day/data
    * publishes route through here; the manifest pointer flip itself is
    * [[graft.operators.StoreManifest.commit]].
    */
  def atomicMove(src: Path, dst: Path): Unit =
    Files.move(src, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)

  def atomicMove(src: String, dst: String): Unit =
    atomicMove(java.nio.file.Paths.get(src), java.nio.file.Paths.get(dst))
}
