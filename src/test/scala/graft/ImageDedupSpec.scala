package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Image-modality dedup (`mm_image_dedup`): the dHash63 perceptual
  * hash must (a) collide for near-identical images (one perturbed
  * off-grid pixel, global brightness shift), (b) separate genuinely
  * different gradients, and (c) the operator must exclude non-image
  * payloads via the magic-byte sniff. */
class ImageDedupSpec extends SparkSpec {

  private def png(id: Long): java.awt.image.BufferedImage =
    Multimodal.decodeRaster(pngBytesOf(id)).get

  private def pngBytesOf(id: Long): Array[Byte] = {
    // reflectively private — call through the package-private member
    Multimodal.pngBytes(id)
  }

  private def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("one perturbed pixel leaves the pair within near-dup Hamming range") {
    val base = png(40L) // w = 4+40%8 = 4, h = 4+40%5 = 4
    val h0 = Multimodal.dHash63(base)
    // a SAMPLED pixel: grid x in {0 = ⌊j·4/9⌋ for j<3, ...}; perturbing
    // (0,0) hard flips at most the comparisons that sample column 0
    val perturbed = png(40L)
    perturbed.setRGB(0, 0, 0xffffff)
    val h1 = Multimodal.dHash63(Multimodal.decodeRaster(encode(perturbed)).get)
    val hamming = java.lang.Long.bitCount(h0 ^ h1)
    assert(hamming <= 3, s"one-pixel perturbation moved $hamming bits")

    // dHash is gradient-based: a global brightness shift is invisible
    val shifted = png(40L)
    for (y <- 0 until shifted.getHeight; x <- 0 until shifted.getWidth) {
      val p = shifted.getRGB(x, y)
      def lift(c: Int) = math.min(c + 10, 255)
      shifted.setRGB(x, y,
        (lift((p >> 16) & 0xff) << 16) | (lift((p >> 8) & 0xff) << 8) | lift(p & 0xff))
    }
    val h2 = Multimodal.dHash63(Multimodal.decodeRaster(encode(shifted)).get)
    assert(h2 == h0, "brightness shift changed a gradient hash")
  }

  test("genuinely different gradients do not pair") {
    // a horizontal vs a vertical ramp — opposite left/right verdicts
    def ramp(horizontal: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 8; x <- 0 until 9) {
        val v = if (horizontal) 255 - x * 28 else y * 28
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val ha = Multimodal.dHash63(ramp(horizontal = true))
    val hb = Multimodal.dHash63(ramp(horizontal = false))
    assert(java.lang.Long.bitCount(ha ^ hb) > 3,
      "distinct gradients collided within the near-dup threshold")
  }

  test("non-image payloads are excluded by the sniff; keepers are consistent") {
    val out = Multimodal.mmImageDedup(spark, Sf).cache()
    try {
      val nImages = Tables.documents(spark, Sf)
        .filter(col("doc_id") % 5 === 0).count()
      assert(out.count() == nImages, "sniff must route exactly the PNG payloads")
      // exact keeper is a member of its own hash group and minimal
      val bad = out.groupBy("dh").agg(
        min("doc_id").as("lo"), min("keeper").as(("k")))
        .filter(col("lo") =!= col("k")).count()
      assert(bad == 0)
      // near keeper can only improve (<=) on the exact keeper
      assert(out.filter(col("near_keeper") > col("keeper")).count() == 0)
      // the closed-form corpus IS heavily duplicated — the operator
      // must report that, not hide it
      assert(out.filter(col("is_dup")).count() > 0)
    } finally out.unpersist()
  }
}
