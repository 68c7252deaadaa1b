package graft.multimodal

import java.awt.image.BufferedImage
import java.io.File

import javax.imageio.ImageIO

/** One-shot generator for the checked-in PNG fixtures under
  * src/test/resources/images/ (run: sbt "Test/runMain
  * graft.multimodal.GenImageFixtures"). Deterministic: every pixel is a
  * pure function of (image_id, cell) via an integer mix, laid out so each
  * dHash grid cell (9×8 partition of the image) is a constant block —
  * which makes the planted relationships exact:
  *
  *  - ids 1..12, 15: independent pseudo-random cell patterns (pairwise
  *    dHash Hamming ≈ 32, far above any near-dup threshold), at three
  *    sizes exercising the integer area-average downscale;
  *  - id 13: id 1's pattern with ONE cell blown out → dHash Hamming ≤ 2
  *    from id 1 (a near-identical pair the Hamming join must find);
  *  - id 14: id 2's exact pixels re-encoded with an (opaque) alpha
  *    channel → different PNG bytes, identical RGB (byte-digest dedup
  *    misses it; perceptual Hamming 0 catches it);
  *  - id 16: id 15 plus a uniform +5 brightness shift → dHash invariant
  *    by construction (row-local differences).
  *
  * After writing, prints each image's (w, h, dhash, ahash) and all pairs
  * with Hamming ≤ 3 — the goldens pinned in ImagesSpec. */
object GenImageFixtures {

  private def mix(id: Int, i: Int, j: Int): Int = {
    var v = id * 1000003 + i * 7919 + j * 104729 + 0x9e3779b9
    v ^= v >>> 15; v *= 0x85ebca6b
    v ^= v >>> 13; v *= 0xc2b2ae35
    v ^= v >>> 16
    v
  }

  /** Cell color for (id, cell i of 9, cell j of 8), optionally shifted. */
  private def cellRgb(id: Int, i: Int, j: Int, shift: Int): Int = {
    val m = mix(id, i, j)
    def c(x: Int) = math.min(255, math.max(0, (x & 0xff) + shift))
    (c(m) << 16) | (c(m >>> 8) << 8) | c(m >>> 16)
  }

  private def paint(id: Int, w: Int, h: Int, shift: Int = 0,
      blowout: Option[(Int, Int)] = None,
      imageType: Int = BufferedImage.TYPE_INT_RGB): BufferedImage = {
    val img = new BufferedImage(w, h, imageType)
    for (y <- 0 until h; x <- 0 until w) {
      val i = x * 9 / w
      val j = y * 8 / h
      val rgb =
        if (blowout.contains((i, j))) 0xffffff
        else cellRgb(id, i, j, shift)
      img.setRGB(x, y, rgb)
    }
    img
  }

  def main(args: Array[String]): Unit = {
    val outDir = new File("src/test/resources/images")
    outDir.mkdirs()
    def size(id: Int): (Int, Int) = (id % 3) match {
      case 0 => (36, 32) // 4×4 px cells
      case 1 => (72, 64) // 8×8 px cells
      case _ => (45, 40) // 5×5 px cells
    }
    def write(id: Int, img: BufferedImage): Unit =
      ImageIO.write(img, "png", new File(outDir, f"img_$id%02d.png"))

    for (id <- (1 to 12) :+ 15) {
      val (w, h) = size(id)
      write(id, paint(id, w, h))
    }
    val (w1, h1) = size(1)
    write(13, paint(1, w1, h1, blowout = Some((4, 3))))
    val (w2, h2) = size(2)
    write(14, paint(2, w2, h2, imageType = BufferedImage.TYPE_INT_ARGB))
    val (w15, h15) = size(15)
    write(16, paint(15, w15, h15, shift = 5))

    // print goldens
    val hashes = outDir.listFiles().filter(_.getName.endsWith(".png"))
      .sortBy(_.getName).map { f =>
        val g = Images.decodeGray(
          java.nio.file.Files.readAllBytes(f.toPath)).get
        val row = (f.getName, g.width, g.height,
          Images.dhash64(g), Images.ahash64(g))
        println(row)
        row
      }
    for {
      a <- hashes; b <- hashes if a._1 < b._1
      d = java.lang.Long.bitCount(a._4 ^ b._4) if d <= 3
    } println(s"PAIR ${a._1} ${b._1} hamming=$d")
  }
}
