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

  /** Copy `src` recursively into `dst` (created if missing, existing
    * files replaced) — the fixture-clone primitive for queries that
    * MUTATE a store: the pristine base builds once per JVM and each
    * invocation clones it, so the measured work is the mutation path,
    * never the bootstrap (VERDICT r10 on s_snapshot_delete).
    */
  def cpTree(src: Path, dst: Path): Unit = {
    val tree = Files.walk(src)
    try tree.forEach { p =>
      val to = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(to)
      else Files.copy(p, to, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally tree.close()
  }

  def cpTree(src: String, dst: String): Unit =
    cpTree(java.nio.file.Paths.get(src), java.nio.file.Paths.get(dst))

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
