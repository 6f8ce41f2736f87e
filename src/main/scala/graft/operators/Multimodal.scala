package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (training-pipeline mandate): media as
  * opaque `binary` columns with typed metadata, plus a deterministic
  * decode/feature-extract stage.
  *
  * Decode is REAL for PPM/P6 images (`decodePpm` — the format needs no
  * codec, just header parsing + raw RGB; features are channel means +
  * a luminance histogram). The container has no codecs for compressed
  * formats, so everything else goes through `decodeStub`, a
  * clearly-marked deterministic fake (byte histogram "features"); the
  * Spark-side plumbing — schema, typed Dataset, per-partition batched
  * processing, feature column shape — is identical on both paths, so a
  * jpeg/png/audio decoder slots in exactly like the PPM one did.
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

  /** REAL decoder for PPM (P6, maxval 255): header tokens (magic, width,
    * height, maxval; `#` comments skipped) then raw interleaved RGB.
    * Features (FeatureDim = 16): mean R, G, B, mean luminance, luminance
    * std-dev, then an 11-bin luminance histogram (fractions). Returns
    * None on anything malformed — callers fall back to the stub, so a
    * corrupt blob degrades instead of failing the stage.
    */
  def decodePpm(bytes: Array[Byte]): Option[Array[Float]] = {
    // header tokenizer over raw bytes (the pixel section is binary — no
    // string decode of the whole blob)
    var pos = 0
    def nextToken(): Option[String] = {
      while (pos < bytes.length &&
        (bytes(pos).toChar.isWhitespace || bytes(pos).toChar == '#')) {
        if (bytes(pos).toChar == '#')
          while (pos < bytes.length && bytes(pos).toChar != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      if (pos > start) Some(new String(bytes, start, pos - start, "US-ASCII"))
      else None
    }
    for {
      magic <- nextToken() if magic == "P6"
      w <- nextToken().flatMap(_.toIntOption) if w > 0
      h <- nextToken().flatMap(_.toIntOption) if h > 0
      maxval <- nextToken().flatMap(_.toIntOption) if maxval == 255
      // exactly one whitespace byte separates maxval from pixel data
      pixels = pos + 1 if bytes.length - pixels >= w.toLong * h * 3
    } yield {
      val n = w * h
      var r = 0L; var g = 0L; var b = 0L
      val lumHist = new Array[Long](11)
      var sumLum = 0.0; var sumLum2 = 0.0
      var i = 0
      while (i < n) {
        val off = pixels + i * 3
        val pr = bytes(off) & 0xff
        val pg = bytes(off + 1) & 0xff
        val pb = bytes(off + 2) & 0xff
        r += pr; g += pg; b += pb
        val lum = 0.299 * pr + 0.587 * pg + 0.114 * pb
        sumLum += lum; sumLum2 += lum * lum
        lumHist(math.min(10, (lum / 25.6).toInt)) += 1
        i += 1
      }
      val meanLum = sumLum / n
      val varLum = math.max(0.0, sumLum2 / n - meanLum * meanLum)
      val out = new Array[Float](FeatureDim)
      out(0) = (r.toDouble / n / 255.0).toFloat
      out(1) = (g.toDouble / n / 255.0).toFloat
      out(2) = (b.toDouble / n / 255.0).toFloat
      out(3) = (meanLum / 255.0).toFloat
      out(4) = (math.sqrt(varLum) / 255.0).toFloat
      var k = 0
      while (k < 11) { out(5 + k) = lumHist(k).toFloat / n; k += 1 }
      out
    }
  }

  /** Format dispatch: real decode where the format needs no codec,
    * deterministic stub elsewhere (and for malformed real-format blobs).
    */
  def decode(bytes: Array[Byte], format: String): Array[Float] =
    format match {
      case "ppm" => decodePpm(bytes).getOrElse(decodeStub(bytes))
      case _     => decodeStub(bytes)
    }

  /** Typed featurize stage: media bytes → fixed-width features, batched
    * per partition (the batch shape a vectorized/pandas-style UDF uses).
    */
  def featurize(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map(r => MediaFeatures(r.media_id, r.format, r.media.length.toLong,
        decode(r.media, r.format)))
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
