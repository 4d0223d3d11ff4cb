package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale probe for the round-16 multimodal additions — run at two
  * generated scale factors so each operator carries a measured decade
  * ratio (the repo's done-criteria for a new operator: oracle or spec
  * PLUS a scale probe). Min-of-2 interleaved per measurement.
  *
  * Per directory:
  *  - `incr_sec` / `incr_kept`: `payloadIncrementalNearDup` with
  *    history = doc_id % 3 == 0 and the rest as the new batch — the
  *    llm_payload_incremental shape at scale;
  *  - `crossmodal_sec` / `crossmodal_dups`: `crossModalDupGroups`
  *    (SimHash text edges ∪ perceptual payload edges → CC), forced by
  *    counting docs whose canonical moved;
  *  - `img_gen_sec` (untimed context), `img_decode_sec` /
  *    `img_decoded`: `ImageOps.decodeImageMeta` over REAL in-memory
  *    PNGs — one deterministic 24×24 image per doc, seeded by
  *    doc_id % (n/10) so ~10 docs share each image (planted exact
  *    duplicates, linear pair mass);
  *  - `img_pairs_sec` / `img_pairs`: `ImageOps.imageNearDupPairs`
  *    over the same corpus;
  *  - `img_semantic_sec` / `img_semantic_pairs` (r17):
  *    `ImageOps.imageSemanticNearDupPairs` — the patch-statistics
  *    embedding through the banded hyperplane LSH + exact-cosine
  *    verify, same corpus;
  *  - `img_ann_sec` / `img_ann_rows` (r18): `ImageOps.imageAnnTopK` —
  *    image similarity SEARCH, ~1% of docs probing for their 5
  *    nearest images through the IVF route (16 cells, nprobe 2).
  *
  * args: sfDir [sfDir2 ...]
  */
object MultimodalScaleProbe {

  /** Deterministic 24×24 gray PNG for a seed: pixel = a full murmur
    * finalizer over (x, y, seed) — identical seeds give identical
    * bytes; different seeds give INDEPENDENT pixel fields (a weaker
    * xor-by-constant mix left cross-seed cell means correlated and
    * fabricated quadratic near-dup mass at the first probe run). */
  private def makePng(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      24, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 24) {
      var x = 0
      while (x < 24) {
        var z = (x * 31L + y) ^ (seed * -7046029254386353131L)
        z = (z ^ (z >>> 33)) * -49064778989728563L
        z = (z ^ (z >>> 33)) * -4265267296055464877L
        val v = ((z ^ (z >>> 33)) & 0xffL).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{ImageOps, MultimodalOps}
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val runs = args.toSeq.map { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("payload", MultimodalOps.withPayload(col("text")))
      val n = docs.count()
      val hist = docs.filter(col("doc_id") % 3 === 0)
      val fresh = docs.filter(col("doc_id") % 3 =!= 0)
      val histN = hist.count()
      def incr = MultimodalOps.payloadIncrementalNearDup(
        fresh, hist, "doc_id", "payload", histN = histN).count()
      def cross = MultimodalOps.crossModalDupGroups(
        docs, "doc_id", "text", "payload", n = n)
        .filter(col("canonical_id") =!= col("doc_id")).count()
      val (i1, kept) = timed(incr)
      // crossModalDupGroups exceeds dedupGroups' round cap past ~sf1
      // (the r20 CcIterProbe finding): a 25-round death march ending in
      // a throw must not cost the probe its image decade rows — skip
      // the stage above the env threshold (and Try-guard it below it),
      // recording -1
      val crossMaxDocs = sys.env.get("SPARK_GRAFT_MM_CROSS_MAXDOCS")
        .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
        .getOrElse(Long.MaxValue)
      val (c1, dups) =
        if (n > crossMaxDocs) (-1.0, -1L)
        else try timed(cross) catch { case _: Throwable => (-1.0, -1L) }
      val (i2, _) = timed(incr)
      val (c2, _) =
        if (c1 < 0) (-1.0, -1L)
        else try timed(cross) catch { case _: Throwable => (-1.0, -1L) }

      // real-PNG corpus: one image per doc, ~10 docs per distinct seed
      val seedMod = math.max(1L, n / 10L)
      val imgSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("img", BinaryType)))
      val (gen, images) = timed {
        val rdd = docs.select(col("doc_id")).rdd.mapPartitions(_.map { r =>
          val id = r.getLong(0)
          Row(id, makePng(id % seedMod))
        })
        val df = spark.createDataFrame(rdd, imgSchema)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize so the timed ops measure codec, not gen
        df
      }
      def decode = ImageOps.decodeImageMeta(images, "doc_id", "img")
        .agg(sum(when(col("ok"), 1L).otherwise(0L))).head().getLong(0)
      def pairs = ImageOps.imageNearDupPairs(
        images, "doc_id", "img", n = n).count()
      // r17: the semantic path (patch-statistics embedding → banded
      // hyperplane LSH → exact cosine). Identical-seed images embed
      // identically (cosine 1); distinct murmur fields are independent
      // 48-dim noise (cosine ≈ 0) — planted pair mass stays linear.
      def semPairs = ImageOps.imageSemanticNearDupPairs(
        images, "doc_id", "img", threshold = 0.99, n = n).count()
      // r18: image similarity SEARCH — ~1% of docs probe for their 5
      // nearest images through the IVF route (16 cells, nprobe 2).
      def annTopK = ImageOps.imageAnnTopK(
        images, "doc_id", "img", id => id % 97 === 0, topK = 5,
        kCells = 16, nprobe = 2).count()
      val (d1, decoded) = timed(decode)
      val (p1, nPairs) = timed(pairs)
      val (s1, nSem) = timed(semPairs)
      val (a1, nAnn) = timed(annTopK)
      val (d2, _) = timed(decode)
      val (p2, nPairs2) = timed(pairs)
      val (s2, nSem2) = timed(semPairs)
      val (a2, nAnn2) = timed(annTopK)
      require(nPairs == nPairs2, s"non-deterministic image pairs at $dir")
      require(nSem == nSem2, s"non-deterministic semantic pairs at $dir")
      require(nAnn == nAnn2, s"non-deterministic image ann rows at $dir")
      images.unpersist(false)
      s"""{"dir":"$dir","n_docs":$n,"hist_n":$histN,""" +
        s""""incr_sec":${math.min(i1, i2)},"incr_kept":$kept,""" +
        s""""crossmodal_sec":${math.min(c1, c2)},"crossmodal_dups":$dups,""" +
        s""""img_gen_sec":$gen,""" +
        s""""img_decode_sec":${math.min(d1, d2)},"img_decoded":$decoded,""" +
        s""""img_pairs_sec":${math.min(p1, p2)},"img_pairs":$nPairs,""" +
        s""""img_semantic_sec":${math.min(s1, s2)},"img_semantic_pairs":$nSem,""" +
        s""""img_ann_sec":${math.min(a1, a2)},"img_ann_rows":$nAnn}"""
    }
    println(
      s"""{"probe":"multimodal_scale","runs":[${runs.mkString(",")}]}""")
    spark.stop()
  }
}
