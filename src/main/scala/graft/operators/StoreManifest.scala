package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE commit primitive every versioned store publishes through —
  * the Delta/Iceberg-style pointer protocol [[MergeInto]] proved out,
  * extracted so the full-text index ([[InvertedIndex]]) and the rollup
  * cube ([[RollupNav]]) commit the same way instead of via direct
  * directory renames (ADVICE r9: two sequential renames let a
  * concurrent reader transiently see a day missing; a plain
  * `Files.move` silently degrades to copy+delete on filesystems where
  * rename is not atomic).
  *
  * Contract: a version is a newline-joined list of `tag\tvalue` lines
  * under `_graft_manifest/v<N>.manifest`. Manifests are written to a
  * dot-tmp name and renamed into place — the rename IS the commit, and
  * the newest complete manifest IS the current-version pointer. Data
  * files land BEFORE their manifest references them, so at every
  * instant a reader resolving version N sees exactly N's files: no
  * torn segment, no missing day, no half-merged partition. A crash
  * before the rename leaves only unreferenced orphans that the store's
  * vacuum sweeps.
  *
  * Object-store note: this is the shape that PORTS. Directory renames
  * are not atomic on S3-class storage; a single small-file rename (or,
  * there, a conditional PUT of the pointer) is the one primitive a
  * store needs. Everything here funnels through that primitive.
  */
object StoreManifest {

  val ManifestDir = "_graft_manifest"
  private val ManifestRe = """v(\d+)\.manifest""".r

  def esc(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)

  def unesc(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)

  private[operators] def hfs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed version under `dir`, -1 if never committed. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val mDir = new Path(dir, ManifestDir)
    val fs = hfs(spark, mDir)
    if (!fs.exists(mDir)) -1L
    else fs.listStatus(mDir).map(_.getPath.getName)
      .collect { case ManifestRe(n) => n.toLong }
      .foldLeft(-1L)(math.max)
  }

  /** All retained committed versions, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val mDir = new Path(dir, ManifestDir)
    val fs = hfs(spark, mDir)
    if (!fs.exists(mDir)) Seq.empty
    else fs.listStatus(mDir).map(_.getPath.getName)
      .collect { case ManifestRe(n) => n.toLong }.toSeq.sorted
  }

  /** Raw manifest lines of a committed version. */
  def readLines(spark: SparkSession, dir: String, version: Long): Seq[String] = {
    val p = new Path(new Path(dir, ManifestDir), s"v$version.manifest")
    val fs = hfs(spark, p)
    require(fs.exists(p), s"store version $version does not exist under $dir")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.split('\n').toSeq.filter(_.nonEmpty)
  }

  /** Values of `tag` lines in a committed version (e.g. every `file`). */
  def read(spark: SparkSession, dir: String, version: Long,
           tag: String): Seq[String] =
    readLines(spark, dir, version).collect {
      case l if l.startsWith(s"$tag\t") => l.substring(tag.length + 1)
    }

  /** Commit `lines` as version `version`: tmp write, ONE rename — the
    * atomic pointer flip every store publish funnels through.
    */
  def commit(spark: SparkSession, dir: String, version: Long,
             lines: Seq[String]): Unit = {
    val mDir = new Path(dir, ManifestDir)
    val fs = hfs(spark, mDir)
    fs.mkdirs(mDir)
    val tmp = new Path(mDir, s".v$version-${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(mDir, s"v$version.manifest")
    require(fs.rename(tmp, dst), s"manifest commit $tmp -> $dst failed")
  }

  /** Commit a (pinned schema, data files, extra lines) version — the
    * shared encoding of every file-listing store (MergeInto snapshots,
    * RollupNav cubes): one `schema\t<json>` line, sorted `file\t<rel>`
    * lines, then any store-specific lines (e.g. RollupNav's applied
    * `batch\t<id>` records).
    */
  def commitFiles(spark: SparkSession, dir: String, version: Long,
                  schema: org.apache.spark.sql.types.StructType,
                  files: Seq[String], extra: Seq[String] = Nil): Unit =
    commit(spark, dir, version,
      s"schema\t${schema.json}" +: (files.sorted.map("file\t" + _) ++ extra))

  /** Decode a [[commitFiles]] manifest: (pinned schema, relative data
    * file paths).
    */
  def readFiles(spark: SparkSession, dir: String, version: Long)
      : (org.apache.spark.sql.types.StructType, Seq[String]) = {
    val lines = readLines(spark, dir, version)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(lines.head.stripPrefix("schema\t"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    (schema, lines.collect { case l if l.startsWith("file\t") => l.substring(5) })
  }

  /** Delete manifests older than the newest `retain` versions and return
    * the SURVIVING versions (callers sweep their own unreferenced data
    * from that set — file layouts differ per store).
    */
  def expire(spark: SparkSession, dir: String, retain: Int): Seq[Long] = {
    require(retain >= 1, s"must retain at least the current version, got $retain")
    val mDir = new Path(dir, ManifestDir)
    val fs = hfs(spark, mDir)
    val all = versions(spark, dir).reverse
    all.drop(retain).foreach(v =>
      fs.delete(new Path(mDir, s"v$v.manifest"), false))
    all.take(retain)
  }

  /** Write `df` partitioned by `partitionCol` into a scratch dir under
    * `root`, move its data files into the live `partitionCol=value`
    * dirs under version-prefixed names, and return the moved files'
    * root-relative paths. ONE write job regardless of how many
    * partition values the frame spans (the bulk-backfill shape); until
    * the caller's [[commit]], every moved file is an unreferenced
    * orphan invisible to manifest readers.
    */
  def stageAndMove(spark: SparkSession, root: Path, df: DataFrame,
                   partitionCol: String, values: Option[Set[String]],
                   next: Long): Seq[String] = {
    val fs = hfs(spark, root)
    val tmp = new Path(root, s".merge-tmp-${java.util.UUID.randomUUID()}")
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(tmp.toString)
    val moved = Seq.newBuilder[String]
    // values = None moves every staged partition (bulk backfill: the
    // caller need not pre-collect the touched values — the ONE staged
    // write already enumerated them)
    val dirs = values.map(_.map(v => s"$partitionCol=${esc(v)}"))
      .getOrElse(fs.listStatus(tmp).map(_.getPath.getName)
        .filter(_.startsWith(s"$partitionCol=")).toSet)
    dirs.foreach { d =>
      val dstDir = new Path(root, d)
      val srcDir = new Path(tmp, d)
      if (fs.exists(srcDir)) {
        fs.mkdirs(dstDir)
        fs.listStatus(srcDir)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            val name = s"v$next-${f.getPath.getName}"
            val to = new Path(dstDir, name)
            require(fs.rename(f.getPath, to), s"rename ${f.getPath} -> $to failed")
            moved += s"${dstDir.getName}/$name"
          }
      }
    }
    fs.delete(tmp, true)
    moved.result()
  }
}
