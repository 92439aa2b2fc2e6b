package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star extension): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction / resize / frame-sampling over them with a
  * REAL pure-JDK codec ([[ImageCodec]] — `javax.imageio` PNG/BMP/GIF +
  * `Graphics2D` scaling; no external library).
  *
  * The fixture has no image column, so `synthesizePng`/`synthesizeGif`
  * derive a deterministic image per row from the id (solid colours whose
  * dimensions and channel values are closed-form functions of the id).
  * That makes the REAL encode→decode→feature path oracle-checkable: DuckDB
  * predicts the decoder's output from the id alone, so a hash match
  * certifies the whole codec round trip, not a stub.
  *
  * Scale shape: every operator is a per-row JVM codec call — map-side
  * only, embarrassingly parallel across partitions, no shuffle, nothing
  * on the driver. At 100 TB the binary column streams through the same
  * UDF batch-wise; the deterministic synthesis is the only fixture-ism.
  */
/** Decoded per-asset image features (the real codec's output schema).
  * Top-level (not nested in the object): whole-stage codegen compiles
  * accessor calls against this class, and Janino rejects members of a
  * non-public enclosure — nesting it would silently drop every decode
  * query out of codegen.
  */
case class ImgStats(width: Int, height: Int,
                    mean_r: Double, mean_g: Double, mean_b: Double)

/** Per-frame features of a multi-frame (animated GIF) asset. */
case class FrameStats(frame_no: Int, width: Int, height: Int,
                      mean_grey: Double)

/** Decoded per-asset audio features (the real WAV codec's output schema;
  * top-level for the same codegen reason as [[ImgStats]]).
  */
case class AudioStats(duration_ms: Double, sample_rate: Int, channels: Int,
                      mean_amp: Double, rms: Double)

/** Per-frame features of an AVI video asset ([[VideoCodec]]'s output
  * schema; top-level for the same codegen reason as [[ImgStats]]).
  */
case class VideoFrameStats(frame_no: Int, width: Int, height: Int, fps: Double,
                           mean_r: Double, mean_g: Double, mean_b: Double)

object Multimodal {

  /** Wrap a table into the canonical multimodal schema:
    * (id, asset struct{uri, mime, data binary, meta map}).
    */
  def toAsset(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): DataFrame =
    df.select(
      col(idCol),
      struct(
        concat(lit("mem://"), col(idCol).cast("string")).as("uri"),
        lit(mime).as("mime"),
        col(payloadCol).cast("binary").as("data"),
        map(lit("n_bytes"), octet_length(col(payloadCol).cast("binary")).cast("string"))
          .as("meta")).as("asset"))

  // ---- deterministic synthesis formulas (mirrored verbatim in the DuckDB
  // oracles; keep the two in lockstep) --------------------------------------
  //   width  = 8 + id % 9            height = 8 + (id*3) % 9
  //   r = id % 256   g = (id*7) % 256   b = (id*13) % 256
  //   frame grey(f)  = (id*5 + f*31) % 256
  private def synthW(id: Long): Int = (8 + id % 9).toInt
  private def synthH(id: Long): Int = (8 + id * 3 % 9).toInt

  private val synthPngUdf = udf((id: Long) =>
    ImageCodec.solidPng(synthW(id), synthH(id),
      (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt))

  private val synthGifUdf = udf((id: Long, frames: Int) =>
    ImageCodec.animatedGif(synthW(id), synthH(id),
      (0 until frames).map(f => ((id * 5 + f * 31) % 256).toInt)))

  /** Add a real PNG payload column (`png`) derived from the id. */
  def synthesizePng(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("png", synthPngUdf(col(idCol)))

  /** Add a real animated-GIF payload column (`gif`) with `frames` frames. */
  def synthesizeGif(df: DataFrame, idCol: String, frames: Int = 4): DataFrame =
    df.withColumn("gif", synthGifUdf(col(idCol), lit(frames)))

  // bijective 64-bit mix (odd-multiplier): distinct codes for distinct
  // ids, min pairwise Hamming 14 across the fixture id range (verified) —
  // far outside any banding radius, so planted dups are the ONLY pairs
  private val dhashMix = 0x9e3779b97f4a7c15L

  private val patternPngUdf = udf((code: Long) =>
    ImageCodec.patternPng(code * dhashMix))

  /** Add a real PNG payload (`png`) whose dHash is the bijective mix of
    * `codeCol` — equal codes (planted dups) give bit-identical hashes,
    * distinct codes give hashes far apart in Hamming space.
    */
  def synthesizePatternPng(df: DataFrame, codeCol: Column): DataFrame =
    df.withColumn("png", patternPngUdf(codeCol))

  private val dHashUdf = udf((b: Array[Byte]) => ImageCodec.dHash(b))

  /** Perceptual fingerprints: (id, dhash) per asset — REAL decode +
    * resize + dHash; undecodable payloads yield null. Feed to
    * [[Dedup.hammingPairs]] for image near-dup pairs.
    */
  def imageHashes(df: DataFrame, idCol: String,
                  dataCol: Column = col("asset.data")): DataFrame =
    df.select(col(idCol), dHashUdf(dataCol).as("dhash"))

  private val patternWavUdf = udf((code: Long, gain: Int) =>
    AudioCodec.patternWav(code * dhashMix, gain))

  /** Add a real WAV payload (`wav`) whose [[AudioCodec.audioFingerprint]]
    * is the bijective mix of `codeCol` — equal codes (planted dups) give
    * bit-identical fingerprints even at DIFFERENT `gainCol` volumes
    * (byte-distinct payloads), distinct codes give fingerprints far apart
    * in Hamming space (the same odd-multiplier mix as the image path).
    */
  def synthesizePatternWav(df: DataFrame, codeCol: Column,
                           gainCol: Column): DataFrame =
    df.withColumn("wav", patternWavUdf(codeCol, gainCol.cast("int")))

  private val audioFpUdf = udf((b: Array[Byte]) => AudioCodec.audioFingerprint(b))

  /** Perceptual audio fingerprints: (id, afp) per asset — REAL decode +
    * windowed energy-delta hash; undecodable payloads yield null. Feed to
    * [[Dedup.hammingPairs]] for audio near-dup pairs, exactly as
    * [[imageHashes]] feeds the image path.
    */
  def audioHashes(df: DataFrame, idCol: String,
                  dataCol: Column = col("asset.data")): DataFrame =
    df.select(col(idCol), audioFpUdf(dataCol).as("afp"))

  private val synthWavUdf = udf((id: Long) => AudioCodec.synthWav(id))

  /** Add a real WAV payload column (`wav`) derived from the id (see
    * `AudioCodec.synthWav` for the closed-form waveform the oracle
    * mirrors).
    */
  def synthesizeWav(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("wav", synthWavUdf(col(idCol)))

  private val audioDecodeUdf = udf((b: Array[Byte]) =>
    AudioCodec.decodeStats(b).map {
      case (dur, sr, ch, mean, rms) => AudioStats(dur, sr, ch, mean, rms)
    })

  /** REAL audio decode: (id, duration_ms, sample_rate, channels, mean_amp,
    * rms) per asset; an undecodable payload yields nulls, never a task
    * failure.
    */
  def audioFeatures(df: DataFrame, idCol: String,
                    dataCol: Column = col("asset.data")): DataFrame =
    df.select(col(idCol), audioDecodeUdf(dataCol).as("au"))
      .select(col(idCol),
        col("au.duration_ms").as("duration_ms"),
        col("au.sample_rate").as("sample_rate"),
        col("au.channels").as("channels"),
        col("au.mean_amp").as("mean_amp"), col("au.rms").as("rms"))

  private val synthAviUdf = udf((id: Long) => VideoCodec.synthAvi(id))

  /** Add a real AVI payload column (`avi`) derived from the id (see
    * `VideoCodec.synthAvi` for the closed-form per-frame colours the
    * oracle mirrors).
    */
  def synthesizeAvi(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("avi", synthAviUdf(col(idCol)))

  private val synthAviMjpegUdf = udf((id: Long) => VideoCodec.synthAviMjpeg(id))

  /** MJPEG sibling of [[synthesizeAvi]]: real JPEG frames inside the same
    * RIFF container (see `VideoCodec.synthAviMjpeg` for the closed-form
    * grey levels the oracle mirrors — exact because solid grey at JPEG
    * quality 100 round-trips losslessly).
    */
  def synthesizeAviMjpeg(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("avi", synthAviMjpegUdf(col(idCol)))

  private val videoFramesUdf = udf((b: Array[Byte]) =>
    VideoCodec.aviFrameStats(b).map {
      case (i, w, h, fps, r, g, bl) => VideoFrameStats(i, w, h, fps, r, g, bl)
    })

  /** REAL video frame sampling: parse every frame of an uncompressed-DIB
    * AVI asset to (id, frame_no, width, height, fps, channel means); an
    * undecodable payload explodes to zero frames, never a task failure.
    */
  def videoFrameFeatures(df: DataFrame, idCol: String,
                         dataCol: Column = col("asset.data")): DataFrame =
    df.select(col(idCol), explode(videoFramesUdf(dataCol)).as("fr"))
      .select(col(idCol), col("fr.frame_no").as("frame_no"),
        col("fr.width").as("width"), col("fr.height").as("height"),
        col("fr.fps").as("fps"), col("fr.mean_r").as("mean_r"),
        col("fr.mean_g").as("mean_g"), col("fr.mean_b").as("mean_b"))

  private val decodeUdf = udf((b: Array[Byte]) =>
    ImageCodec.decodeStats(b).map {
      case (w, h, r, g, bl) => ImgStats(w, h, r, g, bl)
    })

  private val gifFramesUdf = udf((b: Array[Byte]) =>
    ImageCodec.gifFrameStats(b).map {
      // mean over ALL channels — on an r==g==b synthesis frame this equals
      // each channel exactly, but a real colour frame must not report its
      // red channel as "grey"
      case (i, w, h, r, g, bl) => FrameStats(i, w, h, (r + g + bl) / 3.0)
    })

  private val resizeUdf = udf((b: Array[Byte], tw: Int, th: Int) =>
    ImageCodec.resizePng(b, tw, th))

  /** REAL decode: (id, width, height, per-channel mean) per asset; an
    * undecodable payload yields nulls, never a task failure.
    */
  def decodeFeatures(df: DataFrame, idCol: String,
                     dataCol: Column = col("asset.data")): DataFrame =
    df.select(col(idCol), decodeUdf(dataCol).as("img"))
      .select(col(idCol),
        col("img.width").as("width"), col("img.height").as("height"),
        col("img.mean_r").as("mean_r"), col("img.mean_g").as("mean_g"),
        col("img.mean_b").as("mean_b"))

  /** REAL resize (Graphics2D bilinear onto tw×th) re-encoded as PNG. */
  def resize(df: DataFrame, idCol: String, tw: Int, th: Int,
             dataCol: Column = col("asset.data")): DataFrame =
    df.select(col(idCol), resizeUdf(dataCol, lit(tw), lit(th)).as("resized_png"))

  /** Resize then re-decode — the feature view of the resized asset. */
  def resizeFeatures(df: DataFrame, idCol: String, tw: Int, th: Int,
                     dataCol: Column = col("asset.data")): DataFrame =
    decodeFeatures(resize(df, idCol, tw, th, dataCol), idCol, col("resized_png"))

  /** REAL frame sampling: decode every frame of a multi-frame GIF asset
    * to (id, frame_no, width, height, mean_grey).
    */
  def frameFeatures(df: DataFrame, idCol: String,
                    dataCol: Column = col("asset.data")): DataFrame =
    df.select(col(idCol), explode(gifFramesUdf(dataCol)).as("fr"))
      .select(col(idCol), col("fr.frame_no").as("frame_no"),
        col("fr.width").as("width"), col("fr.height").as("height"),
        col("fr.mean_grey").as("mean_grey"))
}
