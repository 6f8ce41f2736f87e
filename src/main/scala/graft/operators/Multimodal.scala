package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (training-pipeline mandate): media as
  * opaque `binary` columns with typed metadata, plus a deterministic
  * decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (byte histogram "features"); the
  * Spark-side plumbing — schema, typed Dataset, per-partition batched
  * processing, feature column shape — is real and tested. Swapping in a
  * true decoder changes ONE function body.
  *
  * Scale notes: decode runs in `mapPartitions`, the per-partition
  * imperative escape hatch (SURVEY.md §1.3) — media bytes never shuffle;
  * only fixed-width feature vectors and metadata leave the stage.
  * Partition sizing for 100 TB media: cap `spark.sql.files.maxPartitionBytes`
  * so one partition of blobs fits executor memory, and store media in its
  * own parquet column chunk so metadata-only queries never read bytes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media: Array[Byte], format: String,
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
                           features: Array[Float])

  val FeatureDim = 16

  /** STUB decoder — deterministic byte-histogram in place of a real
    * image/audio decode (codecs unavailable offline). Real decode slots
    * in here, signature unchanged.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % FeatureDim) += 1f; i += 1 }
    val n = math.max(1, bytes.length).toFloat
    hist.map(_ / n)
  }

  /** Typed featurize stage: media bytes → fixed-width features, batched
    * per partition (the batch shape a vectorized/pandas-style UDF uses).
    */
  def featurize(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map(r => MediaFeatures(r.media_id, r.format, r.media.length.toLong,
        decodeStub(r.media)))
    }
  }

  /** STUB frame sampler — deterministic fixed-stride chunking standing in
    * for video frame extraction (codecs unavailable offline): every
    * `stride`-th window of `frameSize` bytes becomes one "frame". A real
    * decoder slots in with the same (blob → frames) signature.
    */
  def sampleFramesStub(bytes: Array[Byte], frameSize: Int = 64,
                       stride: Int = 256): Seq[Array[Byte]] =
    if (bytes.length < frameSize) Seq.empty
    else (0 to bytes.length - frameSize by stride) // inclusive: the last full frame counts
      .map(off => bytes.slice(off, off + frameSize))

  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Blob → sampled frames, one row per frame; bytes stay partition-local
    * until reduced to fixed-width features downstream (the video analog
    * of `featurize`). A generator-style explode in typed form.
    */
  def explodeFrames(rows: Dataset[MediaRow]): Dataset[FrameRow] = {
    import rows.sparkSession.implicits._
    rows.flatMap(r => sampleFramesStub(r.media).zipWithIndex.map {
      case (f, i) => FrameRow(r.media_id, i, f)
    })
  }

  /** Demo pipeline over driver testdata: documents' text bytes stand in
    * for media blobs; downstream is a plain columnar aggregate.
    */
  def featureStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = docs.select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("media"),
        col("lang").as("format"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
    featurize(media)
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"))
      .orderBy("format")
  }
}
