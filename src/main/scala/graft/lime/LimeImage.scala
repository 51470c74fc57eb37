package graft.lime

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LIME image explanations (Ribeiro et al. 2016 §3; public reference
  * `marcotcr/lime` lime_image.py): mask superpixels, score the
  * black box on the perturbed image, fit a kernel-weighted ridge on
  * the binary mask features, report the top superpixels.
  *
  * Harness adaptation, per the multimodal mandate: the container has
  * no image codecs, so the DECODE step is the pluggable seam — the
  * same contract as LlmData.MmDecoder. Images arrive as opaque binary
  * payloads + metadata; the default decoder parses a little-endian
  * float32 stream into a √n×√n grayscale pixel grid, and `f32leRgb`
  * reads interleaved RGB triplets (real parses of the storage bytes —
  * swapping in JPEG means implementing the same
  * `Array[Byte] => Array[Double]` signature, not touching the
  * operator). Segmentation is a fixed block grid (2×2 pixel blocks),
  * the deterministic stand-in for quickshift — segment ids play the
  * role of the public implementation's segment mask; multi-channel
  * images mask per channel (see explainImage).
  *
  * The black box is the same stand-in style as LimeText's: a logistic
  * over hash-signed pixel sums. Masking superpixel s replaces its
  * pixels with s's own mean (the public `hide_color=None` rule), so a
  * sample's score folds to Σ_s [keep_s ? c_s : m_s] with c_s / m_s
  * precomputed per (image, superpixel) — the samples × superpixels
  * fan-out never touches pixels again (O(images · S · nSamples) rows,
  * pixel count only enters the one decode pass).
  *
  * Everything is deterministic: Lehmer-hash Bernoulli masks (Rng.u01,
  * the lime_perturb idiom), driver-free hash signs, per-image ridge
  * via the exact RidgeAggregator. No oracle (no portable SQL RNG) —
  * LimeSpec grades determinism, schema, and planted-signal recovery.
  */
object LimeImage {

  import Lime.LimeConfig

  /** Deterministic per-pixel sign of the stand-in black box (public
    * to the spec, which recomputes ground-truth superpixel effects).
    */
  def pixelSign(p: Int): Double =
    if ((((p.toLong * 0x9E3779B97F4A7C15L) >>> 33) & 1L) == 0L) 1.0 else -1.0

  /** Default decoder: little-endian IEEE-754 float32 stream → pixel
    * array (the F32LE storage-bytes parse; fails fast on misaligned
    * payloads like LlmData.MmDecoder.F32LE).
    */
  val f32le: Array[Byte] => Array[Double] = { payload =>
    require(payload.length % 4 == 0,
      s"lime_image f32le: payload of ${payload.length} bytes is not a " +
        "whole number of float32 words — corrupt or misaligned blob")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(payload.length / 4)(bb.getFloat.toDouble)
  }

  /** Interleaved-RGB decoder (RGBRGB… little-endian float32 triplets)
    * → flat channel-interleaved array. Same `Array[Byte] =>
    * Array[Double]` seam as `f32le` — a JPEG/PNG decoder plugs in by
    * implementing the signature and emitting the same interleave.
    * Fails fast unless the payload is whole 12-byte pixels.
    */
  val f32leRgb: Array[Byte] => Array[Double] = { payload =>
    require(payload.length % 12 == 0,
      s"lime_image f32leRgb: payload of ${payload.length} bytes is not a " +
        "whole number of RGB float32 triplets — corrupt or misaligned blob")
    f32le(payload)
  }

  /** Fixed-grid segment of pixel p in a side×side image, 2×2 blocks. */
  private def segOf(p: Int, side: Int): Int =
    (p / side / 2) * (side / 2) + (p % side / 2)

  /** images: (doc_id bigint, payload binary). Output: per image the
    * top-k superpixels by |ridge weight| with intercept/r2/local_pred
    * — the lime_explain_text schema with `spix` in place of `word`.
    *
    * `channels` declares the decoder's interleave (1 = grayscale,
    * 3 = RGB): segmentation stays SPATIAL (all channels of a pixel
    * share its superpixel — the public segmentation contract), and
    * masking hides a superpixel by replacing each pixel-channel with
    * the segment's PER-CHANNEL mean — the multi-channel reading of
    * the public `hide_color=None` rule (lime_image.py computes the
    * fudged image per channel). With channels = 1 every formula
    * reduces bit-identically to the grayscale path.
    */
  def explainImage(
      images: DataFrame,
      cfg: LimeConfig = LimeConfig(nSamples = 128, kFeatures = 5,
        kernelWidth = Some(25.0)),
      decode: Array[Byte] => Array[Double] = f32le,
      channels: Int = 1): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._

    // ONE decode pass: pixels → per-superpixel kept/masked
    // contributions (c_s = Σ sign·x over s's flat elements; m_s =
    // Σ_channel mean_{s,c} · Σ sign over s's channel-c elements).
    // Pixel count never appears downstream.
    val perSpix = images.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val x = decode(payload)
        require(x.length % channels == 0,
          s"lime_image: ${x.length} values is not a whole number of " +
            s"$channels-channel pixels")
        val nPixels = x.length / channels
        val side = math.sqrt(nPixels.toDouble).toInt
        require(side * side == nPixels && side % 2 == 0,
          s"lime_image: $nPixels pixels is not an even-sided square grid")
        val nSeg = (side / 2) * (side / 2)
        val cs = new Array[Double](nSeg)
        val sumSign = Array.ofDim[Double](nSeg, channels)
        val sumX = Array.ofDim[Double](nSeg, channels)
        val cnt = Array.ofDim[Int](nSeg, channels)
        for (f <- x.indices) {
          val p = f / channels; val c = f % channels
          val s = segOf(p, side)
          cs(s) += pixelSign(f) * x(f)
          sumSign(s)(c) += pixelSign(f)
          sumX(s)(c) += x(f)
          cnt(s)(c) += 1
        }
        (0 until nSeg).map { s =>
          val masked = (0 until channels)
            .map(c => sumX(s)(c) / cnt(s)(c) * sumSign(s)(c)).sum
          (id, s, cs(s), masked, nSeg, x.length)
        }
      }
      // n_vals is the FLAT element count (pixels × channels) — named
      // so because the sigmoid normalization below is over flat
      // elements, not pixels; for grayscale the two coincide
      .toDF("doc_id", "spix", "c_kept", "c_masked", "n_seg", "n_vals")

    // samples × superpixels fan-out; sample 0 is the unperturbed image
    val sw = perSpix
      .withColumn("sample_id", explode(sequence(lit(0), lit(cfg.nSamples - 1))))
      .withColumn("keep",
        when(col("sample_id") === 0, lit(1.0))
          .otherwise((Rng.u01(lit(cfg.seed), col("doc_id"), col("sample_id"),
            col("spix")) < 0.5).cast("double")))

    val persample = sw.groupBy("doc_id", "sample_id", "n_seg", "n_vals")
      .agg(
        sum(col("keep") * col("c_kept") +
          (lit(1.0) - col("keep")) * col("c_masked")).as("score_lin"),
        sum(col("keep")).as("n_kept"),
        array_sort(collect_list(struct(col("spix"), col("keep")))).as("zs"))
      .withColumn("pred",
        lit(1.0) / (lit(1.0) + exp(-col("score_lin") / sqrt(col("n_vals").cast("double")))))
      // binary-mask cosine distance ×100 against kernel width 25 —
      // the LimeText rule (itself the public implementation's)
      .withColumn("dist",
        (lit(1.0) - sqrt(col("n_kept") / col("n_seg").cast("double"))) * 100.0)
      .withColumn("kweight", Lime.kernel(col("dist"), cfg.kernelWidth.getOrElse(25.0)))

    val fits = persample
      .select(col("doc_id"), expr("transform(zs, s -> s.keep)").as("z"),
        col("pred").cast("double").as("y"), col("kweight").cast("double").as("w"),
        col("n_seg"))
      .as[(Long, Array[Double], Double, Double, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (docId, it) =>
        val rows = it.toArray
        val d = rows.head._5
        val agg = new RidgeAggregator(d, cfg.lambda)
        var buf = agg.zero
        rows.foreach { case (_, z, y, w, _) => buf = agg.reduce(buf, RidgeSample(z, y, w)) }
        val fit = agg.finish(buf)
        Iterator((docId, fit.coefs, fit.intercept, fit.r2, fit.localPred))
      }
      .toDF("doc_id", "coefs", "intercept", "r2", "local_pred")

    val w = Window.partitionBy("doc_id").orderBy(abs(col("weight")).desc, col("spix"))
    fits
      .select(col("doc_id"), col("intercept"), col("r2"), col("local_pred"),
        posexplode(col("coefs")))
      .withColumnRenamed("col", "weight").withColumnRenamed("pos", "spix")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= cfg.kFeatures)
      .select("doc_id", "rank", "spix", "weight", "intercept", "r2", "local_pred")
      .orderBy("doc_id", "rank")
  }
}
