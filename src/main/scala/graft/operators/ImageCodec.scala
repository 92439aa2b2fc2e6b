package graft.operators

import java.awt.RenderingHints
import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** Pure-JDK image codec backing the multimodal operators — real
  * `javax.imageio` decode (PNG/BMP/GIF), real `Graphics2D` resize, real
  * multi-frame GIF read/write. No external codec library: everything here
  * ships with the JVM, so the operators work on any executor.
  *
  * All functions are per-payload JVM calls invoked from Spark UDFs over
  * `binary` columns (`Multimodal`): image decoding is inherently a
  * black-box library call, so a codegen'd Catalyst expression buys
  * nothing — the work IS the library call, it parallelizes
  * embarrassingly per partition, and nothing here shuffles or touches
  * the driver.
  *
  * Determinism notes (the oracle relies on these):
  *  - PNG and GIF are lossless; a solid-colour image round-trips to the
  *    exact RGB it was written with.
  *  - channel means accumulate in Long and divide once, so a solid
  *    colour's mean is exactly that colour as a double.
  *  - bilinear interpolation of a constant image is the same constant,
  *    so resize preserves solid colours exactly.
  */
object ImageCodec {

  // in-memory streams only — never spill codec scratch to tmp files
  ImageIO.setUseCache(false)

  /** Encode a solid-colour PNG (the deterministic synthesis used to give
    * the text-only fixture a real image payload).
    */
  def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    toPngBytes(img)
  }

  /** Decode any ImageIO-supported payload to
    * (width, height, meanR, meanG, meanB); None for null/undecodable
    * bytes (a corrupt asset must yield a null row, not a task failure).
    */
  def decodeStats(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (bytes == null) return None
    // ImageIO returns null for an UNRECOGNIZED format but THROWS
    // IIOException for a recognized-but-corrupt payload (e.g. truncated
    // PNG) — both must yield None, not a task failure
    val img = decodeQuietly(bytes)
    if (img == null) None else Some(stats(img))
  }

  /** Real resize: decode, `Graphics2D.drawImage` with bilinear
    * interpolation onto a (tw × th) canvas, re-encode as PNG. Null for
    * undecodable input.
    */
  def resizePng(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    if (bytes == null) return null
    val src = decodeQuietly(bytes)
    if (src == null) return null
    val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g2 = dst.createGraphics()
    try {
      g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(src, 0, 0, tw, th, null)
    } finally g2.dispose()
    toPngBytes(dst)
  }

  /** Encode an animated GIF of solid grey frames. Each frame is
    * TYPE_BYTE_INDEXED with an explicit two-entry palette holding the
    * exact grey, so the GIF writer stores the colour verbatim (no
    * quantization/dither) and decode returns it bit-exact.
    */
  def animatedGif(w: Int, h: Int, greys: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      greys.foreach { c =>
        val v = (c & 0xff).toByte
        val cm = new IndexColorModel(8, 2,
          Array[Byte](v, 0), Array[Byte](v, 0), Array[Byte](v, 0))
        // raster initializes to index 0 = the frame's grey — no fill needed
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode every frame of a multi-frame GIF to
    * (frameNo, width, height, meanR, meanG, meanB). Empty for
    * null/undecodable bytes.
    */
  def gifFrameStats(bytes: Array[Byte]): Seq[(Int, Int, Int, Double, Double, Double)] = {
    if (bytes == null) return Seq.empty
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return Seq.empty }
    val reader = readers.next()
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      // dimension probe before any raster allocation — same bomb guard as
      // decodeQuietly, applied per frame (a GIF logical screen is small
      // but a single frame can still declare huge bounds)
      val bombed = (0 until n).exists { i =>
        val w = reader.getWidth(i).toLong; val h = reader.getHeight(i).toLong
        w <= 0 || h <= 0 || w * h > maxPixels
      }
      if (bombed) return Seq.empty
      (0 until n).map { i =>
        val (w, h, mr, mg, mb) = stats(reader.read(i))
        (i, w, h, mr, mg, mb)
      }
    } catch {
      // a recognized-but-corrupt payload throws mid-read (IIOException);
      // corrupt assets yield no frames, never a task failure
      case scala.util.control.NonFatal(_) => Seq.empty
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Max pixels a single decoded frame may allocate (64M px ≈ 256 MB of
    * INT_RGB) — a decompression-bomb PNG declares huge dimensions in tiny
    * bytes; fully decoding it on the untrusted `binaryFile` ingestion
    * path is an OOM vector. Over-cap payloads are "undecodable" (None /
    * null / no frames), the same contract as corrupt bytes.
    */
  val maxPixels: Long = 64L * 1024 * 1024

  /** Decode that (a) treats a recognized-but-corrupt payload (IIOException
    * mid-decode) the same as an unrecognized one — null — and (b) probes
    * declared dimensions from the header via `ImageReader.getWidth/Height`
    * BEFORE allocating the raster, rejecting anything over `maxPixels`.
    */
  private def decodeQuietly(bytes: Array[Byte]): BufferedImage = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis, true)
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > maxPixels) null
        else reader.read(0)
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => null }
    finally iis.close()
  }

  private def toPngBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Channel sums in Long, one division — exact for solid colours. */
  private def stats(img: BufferedImage): (Int, Int, Double, Double, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }
}
