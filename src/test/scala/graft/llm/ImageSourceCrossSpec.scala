package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Third-decoder cross-check: the BMP payloads the engine encodes are
  * readable by SPARK'S OWN `image` data source (mllib's ImageSchema,
  * which decodes through the same javax.imageio stack but via an
  * entirely separate code path and row layout). The file-based source
  * must agree with [[MediaCodec.decodeImage]] on dimensions, channel
  * count, and the exact pixel bytes — three independent
  * implementations (our encoder arithmetic, our decoder, Spark's
  * source) converging on the same numbers. */
class ImageSourceCrossSpec extends SparkSpec {

  test("spark.read.format(image) agrees with MediaCodec on our BMPs") {
    val dir = java.nio.file.Files.createTempDirectory("bmp_cross")
    val docs = Seq((0L, "cross check"), (3L, "spark image source"),
      (100008L, "cross check"))
    docs.foreach { case (id, text) =>
      java.nio.file.Files.write(
        dir.resolve(s"img_$id.bmp"), MediaCodec.encodeBmp(id, text))
    }
    val imgs = spark.read.format("image").load(dir.toString)
      .select(col("image.origin").as("origin"),
        col("image.width").as("w"), col("image.height").as("h"),
        col("image.nChannels").as("nc"), col("image.mode").as("mode"),
        col("image.data").as("data"))
      .collect()
    assert(imgs.length == docs.length)
    for (r <- imgs) {
      val id = raw".*img_(\d+)\.bmp".r
        .findFirstMatchIn(r.getAs[String]("origin")).get.group(1).toLong
      val text = docs.find(_._1 == id).get._2
      val (w, h) = MediaCodec.imageDims(id)
      assert(r.getAs[Int]("w") == w && r.getAs[Int]("h") == h,
        s"dims for id=$id")
      assert(r.getAs[Int]("nc") == 3, "24-bit BMP -> 3 channels")
      // ImageSchema stores row-major BGR bytes, top row first — the
      // same (b, g, r) our generator painted at (x, y)
      val data = r.getAs[Array[Byte]]("data")
      assert(data.length == w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (pr, pg, pb) = MediaCodec.pixel(x, y, w, text)
        val off = (y * w + x) * 3
        assert((data(off) & 0xff) == pb && (data(off + 1) & 0xff) == pg &&
          (data(off + 2) & 0xff) == pr,
          s"pixel ($x,$y) id=$id")
      }
    }
  }
}
