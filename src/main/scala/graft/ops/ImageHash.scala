package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Perceptual image hashing (dHash) for multimodal near-dup dedup: the
  * image-side counterpart of MinHash/SimHash — re-encoded, re-compressed,
  * or brightness-shifted copies of the same picture must land in the same
  * dedup bucket even though their bytes (and their sha256) differ.
  *
  * The hash is the classic difference hash over a 9×8 average-pooled
  * luminance grid (one bit per horizontally adjacent cell pair → 64 bits),
  * with one robustness twist: a bit is set only when the right cell
  * exceeds the left by ≥ `threshold` (32 levels). Plain `>` flips bits
  * when neighboring cells are near-equal and codec noise (JPEG flat-block
  * error ≤ ~8 levels) lands on either side; the threshold makes every
  * comparison decided by ≥ 32 levels of real signal, so the hash is
  * EXACTLY invariant to uniform brightness shifts and JPEG re-encoding of
  * block-aligned content — the invariance q197's planted jitter proves
  * end to end.
  *
  * All arithmetic is integer (sum/count floor means, integer compares) —
  * bit-reproducible across JVMs and replicable arithmetically in SQL.
  */
object ImageHash {

  // ImageIO defaults to DISK-backed cache streams: every write(OutputStream)
  // / read(InputStream) without this creates+deletes a temp file, so 32
  // concurrent codec tasks serialize on the filesystem (measured: 25 ms/img
  // threaded vs 7 ms/img single-threaded — negative scaling). Images here
  // are KB-sized; memory-cached streams are strictly better. JVM-global,
  // set redundantly by every codec entry point that can load first.
  ImageIO.setUseCache(false)

  val GridW = 9
  val GridH = 8
  val Threshold = 32

  /** Synthesize a grayscale JPEG from a GridH×GridW cell-value matrix
    * (row-major, values 0–255), each cell rendered as an 8×8 block —
    * aligned with JPEG MCUs so flat blocks quantize almost losslessly.
    */
  def grayCellJpeg(cells: Array[Int], cellPx: Int = 8): Array[Byte] = {
    require(cells.length == GridW * GridH, s"need ${GridW * GridH} cells")
    val img = new BufferedImage(GridW * cellPx, GridH * cellPx,
      BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < GridH * cellPx) {
      var x = 0
      while (x < GridW * cellPx) {
        val v = cells((y / cellPx) * GridW + (x / cellPx)) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Integer average-pooled luminance grid (floor means) of a decoded
    * image; `null`-safe (undecodable bytes → None).
    */
  def pooledGrid(bytes: Array[Byte]): Option[Array[Int]] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      if (w == 0 || h == 0) None
      else {
        val sums = Array.fill(GridW * GridH)(0L)
        val counts = Array.fill(GridW * GridH)(0L)
        var y = 0
        while (y < h) {
          val gy = math.min(GridH - 1, y * GridH / h)
          var x = 0
          while (x < w) {
            val gx = math.min(GridW - 1, x * GridW / w)
            val rgb = img.getRGB(x, y)
            // integer Rec.601 luma in 1/1000 units, floored at the end
            val lum = ((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114
            sums(gy * GridW + gx) += lum
            counts(gy * GridW + gx) += 1
            x += 1
          }
          y += 1
        }
        Some(Array.tabulate(GridW * GridH)(i =>
          if (counts(i) == 0) 0 else (sums(i) / counts(i) / 1000).toInt))
      }
    }
  }

  /** 64-bit thresholded dHash — bit (y·8 + x) set iff
    * cell(x+1, y) ≥ cell(x, y) + Threshold.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    pooledGrid(bytes).map { g =>
      var hash = 0L
      var y = 0
      while (y < GridH) {
        var x = 0
        while (x < GridW - 1) {
          if (g(y * GridW + x + 1) >= g(y * GridW + x) + Threshold)
            hash |= 1L << (y * (GridW - 1) + x)
          x += 1
        }
        y += 1
      }
      hash
    }

  /** Planted cell value for q197's synthesized corpus: md5-derived level
    * in {32, 96, 160, 224} (adjacent gaps are multiples of 64 — decided
    * far beyond Threshold + codec noise). Mirrors the SQL derivation
    * `('0x' || substr(md5('img:' || seed || ':' || x || ':' || y), 1, 8))
    * ::BIGINT % 4` exactly.
    */
  def plantedValue(seed: Long, x: Int, y: Int): Int = {
    val hex = Md5.hex8(s"img:$seed:$x:$y")
    (32 + 64 * (java.lang.Long.parseLong(hex, 16) % 4)).toInt
  }
}

/** Thread-local MD5 — `MessageDigest.getInstance` is a synchronized JCA
  * provider lookup PER CALL and measurably serializes 32-thread
  * executors when a planted-value derivation runs per row (q197/q198).
  */
private[ops] object Md5 {
  private val local = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 hex chars of md5(s) — the house `substr(md5(x), 1, 8)`. */
  def hex8(s: String): String = {
    val md = local.get()
    md.reset()
    md.digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString
  }
}
