package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageOps

/** Real-codec coverage for ImageOps (javax.imageio decode / resize /
  * perceptual hash). Fixtures are PNGs GENERATED INSIDE the test —
  * the zero-egress gate: no external media ever enters the build. */
class ImageOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic RGB gradient image. `dir`: 0 = left→right,
    * 1 = right→left, 2 = top→bottom, 3 = bottom→top. */
  private def gradient(w: Int, h: Int, dir: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = dir match {
        case 0 => x * 255 / math.max(1, w - 1)
        case 1 => 255 - x * 255 / math.max(1, w - 1)
        case 2 => y * 255 / math.max(1, h - 1)
        case _ => 255 - y * 255 / math.max(1, h - 1)
      }
      img.setRGB(x, y, (t << 16) | (t << 8) | t)
    }
    img
  }

  /** The same image with one small dark patch — a perceptual NEAR-dup:
    * the edit moves one grid cell's mean slightly, so the 60-bit code
    * stays within a few bits. */
  private def patched(src: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      src.getWidth, src.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try g.drawImage(src, 0, 0, null) finally g.dispose()
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0)
    img
  }

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImageMeta: real PNG decode returns exact dimensions and " +
    "deterministic features; corrupt payloads come back ok=false " +
    "instead of failing the task") {
    val rows = Seq(
      (1L, png(gradient(64, 48, 0))),
      (2L, png(gradient(16, 16, 2))),
      (3L, "definitely not an image payload".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = ImageOps.decodeImageMeta(rows, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(1) && got(1L).getInt(2) == 64 &&
      got(1L).getInt(3) == 48)
    assert(got(2L).getBoolean(1) && got(2L).getInt(2) == 16 &&
      got(2L).getInt(3) == 16)
    assert(!got(3L).getBoolean(1) && got(3L).isNullAt(2) &&
      got(3L).isNullAt(5), "corrupt payload must be a loud ok=false row")
    // mean luma of a symmetric 0..255 gray gradient ≈ 127.5·1000
    val luma = got(1L).getLong(4)
    assert(luma > 120000 && luma < 135000, s"implausible mean luma: $luma")
    // determinism: decoding the same bytes twice gives the same code
    val again = ImageOps.decodeImageMeta(rows, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(again(1L).getLong(5) == got(1L).getLong(5))
  }

  test("aHash60: lossless re-encode is hamming 0; a small patch edit " +
    "stays within 3 bits; different gradient orientations are far") {
    val base = gradient(64, 64, 0)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hBase = ImageOps.aHash60(base)
    // PNG is lossless: decode(encode(img)) has identical pixels
    val roundTrip = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png(base)))
    assert(ham(hBase, ImageOps.aHash60(roundTrip)) == 0)
    assert(ham(hBase, ImageOps.aHash60(patched(base))) <= 3,
      "a 4x4 patch edit moves one cell slightly - a near-dup")
    val others = Seq(gradient(64, 64, 1), gradient(64, 64, 2),
      gradient(64, 64, 3)).map(ImageOps.aHash60)
    others.foreach(h => assert(ham(hBase, h) > 10,
      s"different orientation must be perceptually far: ${ham(hBase, h)}"))
  }

  test("resizeImages: bilinear resize re-encodes a PNG that decodes to " +
    "the exact target box, with source dims recorded") {
    val rows = Seq(
      (1L, png(gradient(64, 48, 0))),
      (2L, "junk".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val got = ImageOps.resizeImages(rows, "doc_id", "payload", 32, 24)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(1) && got(1L).getInt(2) == 64 &&
      got(1L).getInt(3) == 48)
    val outImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L).getAs[Array[Byte]](4)))
    assert(outImg.getWidth == 32 && outImg.getHeight == 24)
    assert(!got(2L).getBoolean(1) && got(2L).isNullAt(4))
  }

  test("imageNearDupPairs: finds exactly the patched near-dup pair over " +
    "real decoded pixels, skipping undecodable payloads") {
    val base = gradient(64, 64, 0)
    val rows = Seq(
      1L -> png(base),
      2L -> png(patched(base)),
      3L -> png(gradient(64, 64, 1)),
      4L -> png(gradient(64, 64, 2)),
      5L -> png(gradient(64, 64, 3)),
      6L -> "corrupt media".getBytes("UTF-8"))
      .toDF("doc_id", "payload")
    val pairs = ImageOps.imageNearDupPairs(rows, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the patched pair, got $pairs")
  }

  test("imageEmbedding: the contrast signature is resize-robust (base " +
    "vs bilinear half-size cosine ~1), orientation-discriminative, " +
    "exposure-invariant in direction, and null for corrupt payloads") {
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    /** base shifted brighter by a constant — the DC kill must make
      * this near-parallel to the original. */
    def brightened(src: java.awt.image.BufferedImage, d: Int) = {
      val img = new java.awt.image.BufferedImage(
        src.getWidth, src.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until src.getHeight; x <- 0 until src.getWidth) {
        val p = src.getRGB(x, y)
        def ch(v: Int) = math.min(255, v + d)
        img.setRGB(x, y, (ch((p >> 16) & 0xff) << 16) |
          (ch((p >> 8) & 0xff) << 8) | ch(p & 0xff))
      }
      img
    }
    val base = gradient(64, 48, 0)
    val resizedPng = ImageOps.resizeImages(
      Seq(1L -> png(base)).toDF("doc_id", "payload"),
      "doc_id", "payload", 32, 24)
      .collect().head.getAs[Array[Byte]]("payload")
    val rows = Seq(
      1L -> png(base),
      2L -> resizedPng,                    // bilinear half-size
      3L -> png(gradient(64, 48, 2)),      // other orientation
      4L -> png(brightened(base, 40)),     // +40 exposure shift
      5L -> "not an image".getBytes("UTF-8"))
      .toDF("doc_id", "payload")
    val embs = ImageOps.imageEmbedding(rows, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getSeq[Float](2)))).toMap
    assert(!embs(5L)._1 && embs(5L)._2.isEmpty, "corrupt → ok=false, null")
    assert(embs(1L)._2.get.length === 48, "4x4 grid x 3 channels")
    val e = (k: Long) => embs(k)._2.get
    assert(cosine(e(1L), e(2L)) > 0.995,
      s"bilinear half-size must stay near-parallel: ${cosine(e(1L), e(2L))}")
    assert(cosine(e(1L), e(4L)) > 0.99,
      s"an exposure shift must not move the direction: ${cosine(e(1L), e(4L))}")
    assert(cosine(e(1L), e(3L)) < 0.5,
      s"orthogonal gradients must not match: ${cosine(e(1L), e(3L))}")
  }

  test("imageSemanticNearDupPairs: finds the resized and re-exposed " +
    "variants of the base image (where aHash bit drift would), skips " +
    "distinct orientations and corrupt payloads, and equals the " +
    "embedNearDupPairs twin over the same embeddings") {
    val base = gradient(64, 48, 0)
    val resizedPng = ImageOps.resizeImages(
      Seq(1L -> png(base)).toDF("doc_id", "payload"),
      "doc_id", "payload", 32, 24)
      .collect().head.getAs[Array[Byte]]("payload")
    val rows = Seq(
      1L -> png(base),
      2L -> resizedPng,
      3L -> png(gradient(64, 48, 2)),
      4L -> png(gradient(48, 64, 3)),
      5L -> "corrupt".getBytes("UTF-8"))
      .toDF("doc_id", "payload")
    val pairs = ImageOps.imageSemanticNearDupPairs(
      rows, "doc_id", "payload", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"exactly the base/resized pair: $pairs")
    // twin: the same embeddings through embedNearDupPairs directly
    val embs = ImageOps.imageEmbedding(rows, "doc_id", "payload")
      .filter("ok").select(col("id").as("doc_id"), col("embedding"))
    val twin = graft.operators.LlmOps.embedNearDupPairs(
      embs, "doc_id", "embedding", threshold = 0.99, dims = 48, n = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twin === pairs, s"twin must agree: $twin vs $pairs")
  }

  test("imageAnnTopK: top-k image retrieval over the contrast " +
    "embedding — the probe's nearest neighbor is its resized variant, " +
    "the ranking matches the brute-force cosine twin at nprobe = " +
    "kCells (exhaustive), and undecodable payloads neither probe nor " +
    "match") {
    val base = gradient(64, 48, 0)
    val resizedPng = ImageOps.resizeImages(
      Seq(1L -> png(base)).toDF("doc_id", "payload"),
      "doc_id", "payload", 32, 24)
      .collect().head.getAs[Array[Byte]]("payload")
    val rows = Seq(
      1L -> png(base),
      2L -> resizedPng,
      3L -> png(gradient(64, 48, 2)),
      4L -> png(gradient(48, 64, 3)),
      5L -> "corrupt".getBytes("UTF-8"))
      .toDF("doc_id", "payload")
    // nprobe = kCells visits every cell → the IVF route is exhaustive
    // and must equal brute force exactly
    val ivf = ImageOps.imageAnnTopK(rows, "doc_id", "payload",
      id => id === 1L, topK = 2, kCells = 2, nprobe = 2)
      .select("probe_id", "cand_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.head._2 === 2L,
      s"probe 1's nearest image must be its resized variant: ${ivf.toSeq}")
    assert(!ivf.exists(t => t._1 == 5L || t._2 == 5L),
      "undecodable payloads neither probe nor match")
    val embs = ImageOps.imageEmbedding(rows, "doc_id", "payload")
      .filter("ok").select(col("id").as("doc_id"), col("embedding"))
    val brute = graft.operators.LlmOps.cosineTopK(
      embs, "doc_id", "embedding", col("doc_id") === 1L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.toSeq === brute.toSeq,
      s"exhaustive IVF must equal brute force: ${ivf.toSeq} vs ${brute.toSeq}")
  }

  test("cmp128: the mean compare is exact in the >48-megapixel regime " +
    "where the old 64-bit cross-multiply silently overflowed (r16 " +
    "advice)") {
    // the overflow regime made concrete: n = 6e7 pixels (a 60 MP
    // photo), per-cell count n/64, per-cell sum up to 255000·count —
    // sums(i)·totalCount ≈ 1.4e19 > 2^63, so the Long product wraps
    // negative and flips the verdict
    val n = 60_000_000L
    val cellCount = n / 64
    val cellSum = 255000L * cellCount        // a saturated-white cell
    val totalSum = cellSum * 2               // corpus mean = half that
    assert(cellSum * n < 0, "precondition: the 64-bit product overflows")
    assert(ImageOps.cmp128(cellSum, n, totalSum, cellCount) > 0,
      "a cell twice the mean must set its bit even past 48 MP")
    // corpus mean per cell is totalSum/64; totalSum/256 is a quarter of it
    assert(ImageOps.cmp128(totalSum / 256, n, totalSum, cellCount) < 0,
      "a cell below the mean must not set its bit")
    // exact tie: equal products on both sides, at overflow magnitude
    assert(ImageOps.cmp128(cellSum, n, cellSum * 64, cellCount) === 0,
      "cellSum·n vs (64·cellSum)·(n/64) is an exact tie")
    // agreement with BigInt on a deterministic sweep spanning both
    // regimes (small products and >2^63 products)
    val vals = Seq(0L, 1L, 255000L, cellCount, cellSum, totalSum, n)
    for (a <- vals; b <- vals; c <- vals; d <- vals) {
      val exact = (BigInt(a) * BigInt(b)).compare(BigInt(c) * BigInt(d))
      assert(Integer.signum(ImageOps.cmp128(a, b, c, d)) === exact,
        s"cmp128($a,$b,$c,$d) disagrees with BigInt")
    }
  }
}
