package graft.queries

/** Once-per-JVM scratch stores for queries whose SUBJECT is a read path
  * over a persisted store (snapshot time travel, CDC diff, cube
  * routing). r9's driver bench showed 7–15× spikes on these queries
  * because every invocation rebuilt its store from scratch in a tempdir
  * — the bench was charging fixture construction, not the operator
  * under test. Now the store builds once per JVM (first invocation) and
  * every later run — including the bench's warm pass, which is the
  * number the protocol compares — measures the read/diff path alone.
  * The BUILD path keeps its own first-class coverage in ScalaTest
  * (MergeSpec, RollupNavSpec, InvertedIndexSpec) and in the queries
  * that intentionally time it (s_agg_rollup_nav, s_sim_ann_store).
  *
  * Stores are keyed by (kind, sfDir), built under a JVM-unique temp
  * dir, and swept by a shutdown hook — repeated Verify/Bench runs leak
  * nothing into /tmp (the r9 zorder lesson).
  */
object Fixtures {

  private val built =
    scala.collection.mutable.Map.empty[(String, String), (String, Map[String, Long])]

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    synchronized { built.values.foreach { case (d, _) => graft.Fs.rmTree(d) } }))

  /** The fixture dir for (kind, sfDir), building it on first use.
    * `build` returns build-time metrics (e.g. files-rewritten counts)
    * that later invocations need without re-running the build.
    */
  def store(kind: String, sfDir: String)
           (build: String => Map[String, Long]): (String, Map[String, Long]) =
    synchronized {
      built.getOrElseUpdate((kind, sfDir), {
        val d = java.nio.file.Files
          .createTempDirectory(s"graft_fx_$kind").toString
        try (d, build(d))
        catch { case e: Throwable => graft.Fs.rmTree(d); throw e }
      })
    }
}
