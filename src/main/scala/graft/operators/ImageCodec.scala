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

  /** dHash grid: (DHASH_W+1) × DHASH_H luminance samples → 64 bits. */
  val DHASH_W = 8
  val DHASH_H = 8

  /** Encode a 9×8 grey PNG whose dHash is EXACTLY `code` — the
    * deterministic synthesis for perceptual-dedup oracles: row y's
    * pixels step up by one grey level wherever the corresponding code
    * bit is 1 and stay level where it is 0, so the dHash comparison
    * (right > left) reproduces the bit verbatim. Values stay within
    * [128, 136] — no clipping for any code.
    */
  def patternPng(code: Long): Array[Byte] = {
    val img = new BufferedImage(DHASH_W + 1, DHASH_H, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < DHASH_H) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      var x = 0
      while (x < DHASH_W) {
        val bit = (code >>> (y * DHASH_W + x)) & 1L
        if (bit == 1L) v += 1 // strictly greater -> dHash bit 1
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    toPngBytes(img)
  }

  /** Difference hash (dHash) of any ImageIO-decodable payload: decode,
    * bilinear-resize to the (DHASH_W+1)×DHASH_H grid, take mean-RGB
    * luminance, emit bit (y·8+x) = 1 iff lum(x+1,y) > lum(x,y). The
    * standard near-dup perceptual fingerprint: stable under re-encoding
    * and scaling, 64 bits, compared by Hamming distance
    * ([[Dedup.hammingPairs]]). None for undecodable bytes.
    */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    val src = decodeQuietly(bytes)
    if (src == null) return None
    val grid =
      if (src.getWidth == DHASH_W + 1 && src.getHeight == DHASH_H) src
      else {
        val dst = new BufferedImage(DHASH_W + 1, DHASH_H, BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        try {
          g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(src, 0, 0, DHASH_W + 1, DHASH_H, null)
        } finally g2.dispose()
        dst
      }
    def lum(x: Int, y: Int): Int = {
      val p = grid.getRGB(x, y)
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff) // ×3 — monotone, no division loss
    }
    var h = 0L
    var y = 0
    while (y < DHASH_H) {
      var x = 0
      while (x < DHASH_W) {
        if (lum(x + 1, y) > lum(x, y)) h |= 1L << (y * DHASH_W + x)
        x += 1
      }
      y += 1
    }
    Some(h)
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
    * (frameNo, width, height, meanR, meanG, meanB) of the COMPOSED frame:
    * GIF frames are often delta-encoded (a small patch raster at a
    * left/top offset plus a disposal code), so each frame's stats are
    * taken over the logical-screen canvas after drawing the frame and
    * honoring the previous frames' disposal metadata — what a viewer
    * shows — not over the raw patch raster. Width/height reported are the
    * canvas dimensions. Uncovered canvas (never-drawn or
    * restored-to-background) reads as black. Empty for null/undecodable
    * bytes.
    */
  def gifFrameStats(bytes: Array[Byte]): Seq[(Int, Int, Int, Double, Double, Double)] = {
    if (bytes == null) return Seq.empty
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    if (iis == null) return Seq.empty // no stream SPI — treat as undecodable
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        // non-GIF formats have no disposal/offset metadata: stat each
        // frame raster directly (the pre-compositing behavior — a PNG
        // asset still yields its one frame rather than silently zero)
        if (!reader.getFormatName.equalsIgnoreCase("gif")) {
          return (0 until n).map { i =>
            val w = reader.getWidth(i).toLong
            val h = reader.getHeight(i).toLong
            if (w <= 0 || h <= 0 || w * h > maxPixels) return Seq.empty
            val (fw, fh, mr, mg, mb) = stats(reader.read(i))
            (i, fw, fh, mr, mg, mb)
          }
        }
        // probe every frame's declared geometry BEFORE any raster
        // allocation — same bomb guard as decodeQuietly, and the canvas
        // (logical screen ∪ frame extents) must fit the cap too
        val frames = (0 until n).map { i =>
          val w = reader.getWidth(i).toLong
          val h = reader.getHeight(i).toLong
          if (w <= 0 || h <= 0 || w * h > maxPixels)
            return Seq.empty
          val (left, top, disposal) = gifFrameMeta(reader, i)
          (i, w.toInt, h.toInt, left, top, disposal)
        }
        val (sw, sh) = gifLogicalScreen(reader)
        val cw = math.max(sw, frames.map(f => f._4 + f._2).max)
        val ch = math.max(sh, frames.map(f => f._5 + f._3).max)
        if (cw.toLong * ch > maxPixels) return Seq.empty
        val canvas = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
        frames.map { case (i, _, _, left, top, disposal) =>
          val patch = reader.read(i)
          // restoreToPrevious needs the pre-draw canvas back after this
          // frame is shown
          val saved =
            if (disposal == "restoreToPrevious") copyCanvas(canvas) else null
          val g2 = canvas.createGraphics()
          try g2.drawImage(patch, left, top, null)
          finally g2.dispose()
          val (w, h, mr, mg, mb) = stats(canvas)
          disposal match {
            case "restoreToBackgroundColor" =>
              // clear the frame's region (background reads as black)
              val g = canvas.createGraphics()
              try {
                g.setColor(java.awt.Color.BLACK)
                g.fillRect(left, top, patch.getWidth, patch.getHeight)
              } finally g.dispose()
            case "restoreToPrevious" =>
              val g = canvas.createGraphics()
              try g.drawImage(saved, 0, 0, null)
              finally g.dispose()
            case _ => // none / doNotDispose: canvas persists
          }
          (i, w, h, mr, mg, mb)
        }
      } catch {
        // a recognized-but-corrupt payload throws mid-read (IIOException);
        // corrupt assets yield no frames, never a task failure
        case scala.util.control.NonFatal(_) => Seq.empty
      } finally reader.dispose()
    } finally iis.close()
  }

  /** (left, top, disposalMethod) from a GIF frame's native metadata;
    * defaults (0, 0, "none") when nodes are absent.
    */
  private def gifFrameMeta(reader: javax.imageio.ImageReader,
                           i: Int): (Int, Int, String) = {
    val root = reader.getImageMetadata(i)
      .getAsTree("javax_imageio_gif_image_1.0")
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    var left = 0; var top = 0; var disposal = "none"
    val kids = root.getChildNodes
    var j = 0
    while (j < kids.getLength) {
      val node = kids.item(j).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      node.getNodeName match {
        case "ImageDescriptor" =>
          left = node.getAttribute("imageLeftPosition").toInt
          top = node.getAttribute("imageTopPosition").toInt
        case "GraphicControlExtension" =>
          val d = node.getAttribute("disposalMethod")
          if (d.nonEmpty) disposal = d
        case _ =>
      }
      j += 1
    }
    (left, top, disposal)
  }

  /** Logical-screen (canvas) dimensions from the GIF stream metadata;
    * (0, 0) when absent — callers fall back to frame extents.
    */
  private def gifLogicalScreen(reader: javax.imageio.ImageReader): (Int, Int) =
    try {
      val root = reader.getStreamMetadata
        .getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = root.getChildNodes
      var j = 0
      while (j < kids.getLength) {
        val node = kids.item(j).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        if (node.getNodeName == "LogicalScreenDescriptor")
          return (node.getAttribute("logicalScreenWidth").toInt,
            node.getAttribute("logicalScreenHeight").toInt)
        j += 1
      }
      (0, 0)
    } catch { case scala.util.control.NonFatal(_) => (0, 0) }

  private def copyCanvas(img: BufferedImage): BufferedImage = {
    val c = new BufferedImage(img.getWidth, img.getHeight, img.getType)
    val g = c.createGraphics()
    try g.drawImage(img, 0, 0, null)
    finally g.dispose()
    c
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
  private[operators] def decodeQuietly(bytes: Array[Byte]): BufferedImage = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    if (iis == null) return null // no stream SPI registered — undecodable
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
  private[operators] def stats(img: BufferedImage): (Int, Int, Double, Double, Double) = {
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
