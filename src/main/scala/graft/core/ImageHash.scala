package graft.core

/** Perceptual image hashing (dHash/aHash) over DECODED pixels — the
  * image-side analog of the text near-dup family: two encodings of the
  * same picture (or a lightly-retouched copy) land within a few bits,
  * so the SimHash banded-Hamming machinery blocks them without
  * all-pairs work.
  *
  * Every step is integer-exact and stated, so the Python oracle can
  * re-derive hashes from a pixel RECIPE with no image libraries:
  *
  *   - gray(p) = 299·r + 587·g + 114·b (the ITU-R 601 luma weights
  *     ×1000 — no division, no rounding);
  *   - the raster divides into a cols×rows grid with floor boundaries:
  *     cell (i, j) covers x ∈ [⌊j·w/cols⌋, ⌊(j+1)·w/cols⌋), y ∈
  *     [⌊i·h/rows⌋, ⌊(i+1)·h/rows⌋); rasters narrower than the grid
  *     (w < cols or h < rows) hash to null — upscaling tiny images
  *     would manufacture identity that isn't there;
  *   - each cell's value is its FLOOR MEAN gray (sum / count in long
  *     arithmetic — overflow-free for any raster the pixel cap admits,
  *     and `//`-mirrorable);
  *   - dHash (9×8 grid): bit i·8+j set iff mean(i,j) > mean(i,j+1) —
  *     64 horizontal-gradient signs;
  *   - aHash (8×8 grid): bit i·8+j set iff cell mean > the global
  *     floor-mean gray of the whole raster.
  *
  * Container bytes never enter the hash: any lossless encoder of the
  * same pixels yields the same value (pinned by the re-encode twins in
  * the gate fixture). */
object ImageHash {

  /** Guarded ImageIO read: header-only dimension probe BEFORE pixel
    * decode (a few-hundred-byte payload can declare a 60000×60000
    * raster — the OOM must be prevented, not caught), undecodable or
    * over-cap payloads → null. The single owner of this logic —
    * [[graft.api.Multimodal.ImageIoDecoder]] routes through it. */
  def readImage(bytes: Array[Byte],
                maxPixels: Long): java.awt.image.BufferedImage = {
    inMemoryIo
    try {
      // the iis close lives in ITS OWN finally: the no-reader branch is
      // the HOT failure path (every junk payload in a crawl), and a
      // stream closed only on the reader branch would leak its cache
      // segments until GC on exactly that path
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > maxPixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: java.io.IOException | _: RuntimeException => null }
  }

  // ImageIO's default useCache=true spools every InputStream decode
  // through a temp FILE; disable once per JVM (first decode per executor)
  @transient private lazy val inMemoryIo: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Per-cell floor-mean grays of a cols×rows grid (row-major), null if
    * the raster is narrower than the grid in either axis. */
  private def gridMeans(img: java.awt.image.BufferedImage,
                        cols: Int, rows: Int): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    if (w < cols || h < rows) return null
    val means = new Array[Long](rows * cols)
    var i = 0
    while (i < rows) {
      val y0 = i * h / rows
      val y1 = (i + 1) * h / rows
      var j = 0
      while (j < cols) {
        val x0 = j * w / cols
        val x1 = (j + 1) * w / cols
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        means(i * cols + j) = sum / ((y1 - y0).toLong * (x1 - x0))
        j += 1
      }
      i += 1
    }
    means
  }

  /** 64-bit difference hash; null (boxed) if undecodable under the grid. */
  def dhash64(img: java.awt.image.BufferedImage): java.lang.Long = {
    val m = gridMeans(img, 9, 8)
    if (m == null) return null
    var bits = 0L
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        if (m(i * 9 + j) > m(i * 9 + j + 1)) bits |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    java.lang.Long.valueOf(bits)
  }

  /** Aspect-preserving target dims against `maxDim`: long side → maxDim,
    * short side → floor(short · maxDim / long); rasters already within
    * the cap pass through at their own size. Integer arithmetic —
    * reproducible anywhere. */
  def fitDims(w: Int, h: Int, maxDim: Int): (Int, Int) =
    if (w <= maxDim && h <= maxDim) (w, h)
    else if (w >= h) (maxDim, math.max(1, (h.toLong * maxDim / w).toInt))
    else (math.max(1, (w.toLong * maxDim / h).toInt), maxDim)

  /** Integer-exact BOX-FILTER downscale to outW×outH: output pixel
    * (i, j) is the per-channel FLOOR MEAN of source cell
    * x ∈ [⌊j·w/outW⌋, ⌊(j+1)·w/outW⌋), y ∈ [⌊i·h/outH⌋, ⌊(i+1)·h/outH⌋)
    * — the [[gridMeans]] grid math applied per channel, emitting
    * row-major RGB bytes (y outer, x inner, R G B). Null if the raster
    * is narrower than the target in either axis (upscaling manufactures
    * pixels that aren't there — resize means reduce). Every step is
    * integer, so an oracle re-derives the exact bytes from a pixel
    * recipe with no image libraries. */
  def resizeBox(img: java.awt.image.BufferedImage,
                outW: Int, outH: Int): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    if (w < outW || h < outH) return null
    val out = new Array[Byte](outH * outW * 3)
    var i = 0
    while (i < outH) {
      val y0 = i.toLong * h / outH
      val y1 = (i + 1).toLong * h / outH
      var j = 0
      while (j < outW) {
        val x0 = j.toLong * w / outW
        val x1 = (j + 1).toLong * w / outW
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0.toInt
        while (y < y1) {
          var x = x0.toInt
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0) * (x1 - x0)
        val o = (i * outW + j) * 3
        out(o) = (sr / n).toByte
        out(o + 1) = (sg / n).toByte
        out(o + 2) = (sb / n).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  /** 64-bit average hash; null (boxed) if undecodable under the grid. */
  def ahash64(img: java.awt.image.BufferedImage): java.lang.Long = {
    val m = gridMeans(img, 8, 8)
    if (m == null) return null
    // global floor mean over the RASTER (not the cell means): exact and
    // independent of how the grid divides the pixels
    val w = img.getWidth
    val h = img.getHeight
    var tot = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        tot += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val avg = tot / (w.toLong * h)
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (m(k) > avg) bits |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(bits)
  }
}
