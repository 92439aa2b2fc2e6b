package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction / frame-sampling as batch functions over
  * them.
  *
  * The Spark-side plumbing — schema, batching, partition-parallel feature
  * extraction, join-back — is real and tested. The codec itself is a
  * clearly-marked deterministic STUB (`fakeDecode*`): this container has no
  * image/audio libraries, so the stub derives "features" from the bytes
  * (lengths, hashes, sampled byte windows) with the exact call shape a real
  * decoder batch function would have.
  */
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

  /** STUB decode: byte length + content hash stand in for width/height/
    * channels a real decoder would emit. Deterministic, codegen'd.
    */
  def fakeDecodeFeatures(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col("asset.data")).cast("long").as("n_bytes"),
      md5(col("asset.data")).as("content_hash"),
      // STUB: fake (w, h) derived from the hash — replace with a real
      // decoder batch call (e.g. mapInPandas + PIL) in a full deployment.
      (abs(xxhash64(col("asset.data"))) % 1920).cast("int").as("fake_width"),
      (abs(xxhash64(col("asset.data"), lit(1))) % 1080).cast("int").as("fake_height"))

  /** STUB resize: deterministic byte-domain downsample standing in for an
    * image resize — keeps every k-th byte so the output length tracks the
    * requested target (real impl: decoder + resampler batch function with
    * this exact signature and output schema).
    */
  def fakeResize(df: DataFrame, idCol: String, targetBytes: Int = 64): DataFrame = {
    // concat of BINARY substrings stays in the byte domain end to end —
    // array_join would coerce through UTF-8 strings and corrupt any byte
    // >= 0x80 into replacement characters
    val sampled = concat((0 until targetBytes).map(i =>
      expr(s"substring(data, cast($i * (octet_length(data) / $targetBytes) as int) + 1, 1)")): _*)
    df.select(col(idCol), col("asset.data").as("data"))
      .select(col(idCol),
        when(octet_length(col("data")) <= targetBytes, col("data"))
          .otherwise(sampled).as("resized_bytes"),
        octet_length(col("data")).cast("long").as("orig_bytes"))
  }

  /** STUB frame-sample: take `frames` evenly-spaced byte windows of
    * `frameBytes` as stand-in video frames (real impl: decoder over
    * mapPartitions with the same output schema).
    */
  def fakeFrameSample(df: DataFrame, idCol: String,
                      frames: Int = 4, frameBytes: Int = 16): DataFrame =
    df.select(col(idCol), col("asset.data").as("data"),
        explode(sequence(lit(0), lit(frames - 1))).as("frame_no"))
      .select(col(idCol), col("frame_no"),
        expr(s"substring(data, cast(frame_no * (octet_length(data) / $frames) as int) + 1, $frameBytes)")
          .as("frame_bytes"))
}
