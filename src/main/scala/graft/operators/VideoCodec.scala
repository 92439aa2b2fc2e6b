package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK video codec backing the multimodal operators: a minimal
  * RIFF-AVI container with either uncompressed 24-bit DIB frames ('00db',
  * the classic `fccHandler='DIB '` layout) or MJPEG frames ('00dc' JPEG
  * bodies, `biCompression='MJPG'` — the codec real video corpora actually
  * contain, decoded through the shared bomb-guarded `javax.imageio`
  * path). Written and parsed here byte-for-byte, no external library.
  * Completes the multimodal family (image [[ImageCodec]] / audio
  * [[AudioCodec]] / video) on the same closed-form-oracle pattern:
  * synthesis is deterministic per id, so DuckDB predicts the PARSER's
  * output from the id alone and a hash match certifies the whole
  * container round trip.
  *
  * The parser is a generic RIFF walk (word-aligned chunks, LIST recursion,
  * JUNK/unknown chunks skipped, '00db'/'00dc' both accepted), not a mirror
  * of the writer's byte layout — the delta-GIF-style tests feed it
  * containers the writer never produces.
  *
  * Determinism notes (the oracle relies on these):
  *  - DIB frames are uncompressed; a solid colour round-trips bit-exact,
  *    and channel means (Long sums, one division) are exact doubles.
  *  - fps = dwRate/dwScale in doubles — exact for integral rates.
  *  - DIB frames, like WAV, carry no decompression bomb vector (decoded
  *    bytes ⊆ payload bytes); MJPEG frames DO, so they route through
  *    [[ImageCodec.decodeQuietly]]'s header-probed [[ImageCodec.maxPixels]]
  *    guard. Declared container DIMENSIONS are also probed against
  *    maxPixels before any per-frame work, and chunk sizes are bounded by
  *    the payload length, so a hostile header can neither allocate nor
  *    loop unboundedly.
  */
object VideoCodec {

  private def fourcc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
  }

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + body.length + (body.length & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(fourcc(tag)).putInt(body.length).put(body)
    if ((body.length & 1) == 1) bb.put(0.toByte) // RIFF word alignment
    bb.array()
  }
  private def list(tag: String, children: Array[Byte]*): Array[Byte] = {
    val kids = children.map(_.length).sum
    val bb = ByteBuffer.allocate(12 + kids).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(fourcc("LIST")).putInt(4 + kids).putInt(fourcc(tag))
    children.foreach(bb.put)
    bb.array()
  }

  /** Shared RIFF-AVI container builder: headers describe (width, height,
    * fps, handler, biCompression); `framePayloads` are the already-encoded
    * per-frame bodies under `frameTag` ('00db' raw / '00dc' compressed).
    */
  private def aviContainer(width: Int, height: Int, fps: Int,
                           handler: String, biCompression: Int,
                           frameTag: String,
                           framePayloads: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && framePayloads.nonEmpty)
    val bufSize = framePayloads.map(_.length).max
    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / fps) // dwMicroSecPerFrame
        .putInt(bufSize * fps) // dwMaxBytesPerSec
        .putInt(0).putInt(0) // padding, flags
        .putInt(framePayloads.size) // dwTotalFrames
        .putInt(0).putInt(1) // initialFrames, dwStreams
        .putInt(bufSize) // suggestedBufferSize
        .putInt(width).putInt(height)
      bb.array()
    }
    val strh = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(fourcc("vids")).putInt(fourcc(handler))
        .putInt(0).putInt(0).putInt(0) // flags, prio/lang, initialFrames
        .putInt(1).putInt(fps) // dwScale, dwRate → fps
        .putInt(0).putInt(framePayloads.size) // start, dwLength
        .putInt(bufSize).putInt(-1).putInt(0) // bufSize, quality, sampleSize
      bb.putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort) // rcFrame
      bb.array()
    }
    val strf = {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24) // planes, bitCount
        .putInt(biCompression).putInt(bufSize) // compression, sizeImage
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val frames = framePayloads.map(chunk(frameTag, _))
    val payload: Array[Byte] = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf))) ++
      list("movi", frames: _*)
    val out = new ByteArrayOutputStream()
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(fourcc("RIFF")).putInt(4 + payload.length).putInt(fourcc("AVI "))
    out.write(head.array())
    out.write(payload)
    out.toByteArray
  }

  /** Encode solid-colour frames (each an 0xRRGGBB int) as an uncompressed
    * 24-bit AVI at `fps` frames/second.
    */
  def aviDib(width: Int, height: Int, fps: Int, frameColors: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frameColors.nonEmpty)
    val rowBytes = (width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    val frameBytes = rowBytes * height
    val frames = frameColors.map { rgb =>
      val body = new Array[Byte](frameBytes)
      val b = (rgb & 0xff).toByte
      val g = ((rgb >> 8) & 0xff).toByte
      val r = ((rgb >> 16) & 0xff).toByte
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val o = y * rowBytes + x * 3
          body(o) = b; body(o + 1) = g; body(o + 2) = r // DIB stores BGR
          x += 1
        }
        y += 1
      }
      body
    }
    aviContainer(width, height, fps, "DIB ", 0, "00db", frames)
  }

  /** Encode solid-GREY frames as an MJPEG AVI ('00dc' JPEG frames,
    * biCompression 'MJPG' — the format real-world video corpora actually
    * contain). Grey at ImageIO quality 1.0 round-trips BIT-EXACT: the
    * libjpeg quality-100 quantization tables are all ones, a solid frame
    * has only DC coefficients, and r=g=b maps to (Y=v, Cb=Cr=128) exactly
    * in the fixed-point colour transform — verified per-value in tests, and
    * what makes a closed-form DuckDB oracle possible for a LOSSY codec.
    */
  def aviMjpeg(width: Int, height: Int, fps: Int, greys: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && greys.nonEmpty)
    aviContainer(width, height, fps, "MJPG", fourcc("MJPG"), "00dc",
      greys.map(jpegGrey(width, height, _)))
  }

  private def jpegGrey(w: Int, h: Int, grey: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (grey << 16) | (grey << 8) | grey
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f) // quality 100: all-ones quant tables
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  // ---- deterministic synthesis formulas (mirrored verbatim in the DuckDB
  // oracle; keep the two in lockstep) ----------------------------------------
  //   width = 8 + id % 9    height = 8 + (id*3) % 9    fps = 10   frames = 3
  //   frame f: r = (id + f*17) % 256   g = (id*7 + f*29) % 256
  //            b = (id*13 + f*41) % 256
  def synthAvi(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + id * 3 % 9).toInt
    val colors = (0 until 3).map { f =>
      val r = ((id + f * 17) % 256).toInt
      val g = ((id * 7 + f * 29) % 256).toInt
      val b = ((id * 13 + f * 41) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    aviDib(w, h, 10, colors)
  }

  // ---- MJPEG synthesis formulas (mirrored verbatim in the DuckDB oracle) ---
  //   width = 8 + id % 9    height = 8 + (id*3) % 9    fps = 10   frames = 3
  //   frame f: grey = (id*11 + f*37) % 256  (all three channels)
  def synthAviMjpeg(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + id * 3 % 9).toInt
    aviMjpeg(w, h, 10, (0 until 3).map(f => ((id * 11 + f * 37) % 256).toInt))
  }

  /** Parse an uncompressed-DIB AVI payload to per-frame
    * (frameNo, width, height, fps, meanR, meanG, meanB). Empty for
    * null / non-AVI / corrupt / non-24-bit-BI_RGB payloads — a bad asset
    * yields no frames, never a task failure.
    */
  def aviFrameStats(bytes: Array[Byte]): Seq[(Int, Int, Int, Double, Double, Double, Double)] = {
    if (bytes == null || bytes.length < 24) return Seq.empty
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(0) != fourcc("RIFF") || bb.getInt(8) != fourcc("AVI "))
        return Seq.empty
      var width = 0; var height = 0; var bitCount = 0; var compression = -1
      var scale = 0; var rate = 0
      val frames = Seq.newBuilder[(Int, Int)] // (offset, length) of frame data

      // generic word-aligned RIFF walk; chunk sizes are clamped against
      // the actual payload so a hostile header cannot push the cursor out
      // of bounds or loop forever (the cursor strictly advances), and
      // nesting depth is capped — legal AVI uses ≤ 3 LIST levels, while a
      // crafted tower of nested LISTs would otherwise recurse once per
      // 12-byte header and throw StackOverflowError (a VirtualMachineError
      // that escapes NonFatal, i.e. a task failure)
      val maxDepth = 16
      def walk(start: Int, end: Int, inMovi: Boolean, inStrl: Boolean,
               depth: Int): Unit = {
        if (depth > maxDepth) return
        var p = start
        while (p + 8 <= end) {
          val tag = bb.getInt(p)
          val size = bb.getInt(p + 4)
          // Long arithmetic: a hostile size near Int.MaxValue would wrap
          // `p + 8 + size` negative and slip past an Int comparison
          if (size < 0 || p + 8L + size > end) return // corrupt: stop cleanly
          if (tag == fourcc("LIST")) {
            val listType = if (size >= 4) bb.getInt(p + 8) else 0
            walk(p + 12, p + 8 + size,
              inMovi || listType == fourcc("movi"),
              inStrl || listType == fourcc("strl"),
              depth + 1)
          } else if (inStrl && tag == fourcc("strh") && size >= 32) {
            // only the first video stream's timing is read
            if (bb.getInt(p + 8) == fourcc("vids") && scale == 0) {
              scale = bb.getInt(p + 28)
              rate = bb.getInt(p + 32)
            }
          } else if (inStrl && tag == fourcc("strf") && size >= 40 && width == 0) {
            width = bb.getInt(p + 12)
            height = math.abs(bb.getInt(p + 16)) // negative = top-down DIB
            bitCount = bb.getShort(p + 22).toInt
            compression = bb.getInt(p + 24)
          } else if (inMovi &&
              ((tag & 0xffff0000) == (fourcc("00db") & 0xffff0000) ||
               (tag & 0xffff0000) == (fourcc("00dc") & 0xffff0000))) {
            frames += ((p + 8, size))
          }
          p += 8 + size + (size & 1) // word alignment
        }
      }
      walk(12, bytes.length, inMovi = false, inStrl = false, depth = 0)

      if (width <= 0 || height <= 0 || scale <= 0 || rate <= 0 ||
          width.toLong * height > ImageCodec.maxPixels) return Seq.empty
      val fps = rate.toDouble / scale
      if (compression == fourcc("MJPG")) {
        // MJPEG: each frame body is a standalone JPEG, decoded through the
        // shared bomb-guarded ImageIO path (header dims probed against
        // maxPixels BEFORE any pixel allocation). A frame that fails to
        // decode — or decodes to dimensions disagreeing with the container
        // header — is corrupt: skipped, never a task failure.
        frames.result().zipWithIndex.flatMap { case ((off, len), i) =>
          if (len <= 0) None
          else {
            val img = ImageCodec.decodeQuietly(
              java.util.Arrays.copyOfRange(bytes, off, off + len))
            if (img == null || img.getWidth != width || img.getHeight != height) None
            else {
              val (_, _, r, g, b) = ImageCodec.stats(img)
              Some((i, width, height, fps, r, g, b))
            }
          }
        }
      } else if (compression == 0 && bitCount == 24) {
        val rowBytes = (width * 3 + 3) & ~3
        val expected = rowBytes * height
        frames.result().zipWithIndex.flatMap { case ((off, len), i) =>
          if (len < expected) None // truncated frame: skip, don't crash
          else {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) {
                val o = off + y * rowBytes + x * 3
                sb += bytes(o) & 0xff
                sg += bytes(o + 1) & 0xff
                sr += bytes(o + 2) & 0xff
                x += 1
              }
              y += 1
            }
            val n = width.toLong * height
            Some((i, width, height, fps,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
          }
        }
      } else Seq.empty // unsupported codec: no frames, not a failure
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }
}
