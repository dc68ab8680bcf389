package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bottom-k sample sketch: determinism (set-function, multiplicity- and
  * order-blind), exact union invariance, the discrete rank convention,
  * and a fuzz of the heap buffer against a plain-Scala reference. */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(rows: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    rows.toDF("id", "v")
      .select(lit("g").as("g"), xxhash64(col("id")).as("h"), col("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(new BottomK.BottomKAgg(k).toColumn.name("sk"))
      .toDF("g", "sk")
      .select(explode(col("sk")).as("e"))
      .select(col("e.h"), col("e.v")).as[(Long, Long)].collect().toSeq

  test("plain-Scala reference: retained set = k smallest flipped hashes") {
    val rows = (0L until 500L).map(i => (i * 7919L, i))
    val k = 32
    val expected = rows
      .map { case (id, v) =>
        (org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(id, org.apache.spark.sql.types.LongType, 42L)
          ^ Long.MinValue, v)
      }
      .sortBy(_._1).take(k)
    assert(sketchOf(rows, k) == expected)
  }

  test("multiplicity- and order-blind: shuffled 5x-duplicated input, same array") {
    val rows = (0L until 200L).map(i => (i, i * 3L))
    val dups = new scala.util.Random(7).shuffle(
      Seq.fill(5)(rows).flatten.toList)
    assert(sketchOf(dups, 64) == sketchOf(rows, 64))
  }

  test("union of partial sketches == direct sketch (exact array equality)") {
    val all = (0L until 300L).map(i => (i, i % 97L))
    val (a, b) = all.splitAt(120)
    val k = 48
    val partials = Seq(sketchOf(a, k), sketchOf(b, k))
      .map(_.map { case (h, v) => BottomK.Entry(h, v) })
    val unioned = partials.map(p => (1, p)).toDF("g", "sk")
      .groupBy("g").agg(BottomK.unionAll(collect_list(col("sk")), k).as("u"))
      .select(explode(col("u")).as("e"))
      .select(col("e.h"), col("e.v")).as[(Long, Long)].collect().toSeq
    assert(unioned == sketchOf(all, k))
  }

  test("quantile: discrete ceil(q*m) rank, exact when m <= k") {
    val rows = (1L to 100L).map(i => (i, i)) // values 1..100
    val sk = sketchOf(rows, 256).map { case (h, v) => BottomK.Entry(h, v) }
    val df = Seq((1, sk)).toDF("g", "sk")
    def q(p: Double): Long =
      df.select(BottomK.quantile(col("sk"), p)).as[Long].collect().head
    assert(q(0.5) == 50L && q(0.9) == 90L && q(0.01) == 1L && q(1.0) == 100L)
  }

  test("fuzz: heap buffer vs sort-take reference over random streams") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(40)
      val n = rnd.nextInt(300)
      val items = Seq.fill(n)((rnd.nextLong(), rnd.nextLong()))
      var buf: (Int, Array[Long], Array[Long]) =
        (0, Array.emptyLongArray, Array.emptyLongArray)
      // random split point: reduce one half, merge the other
      val (l, r) = items.splitAt(if (n == 0) 0 else rnd.nextInt(n + 1))
      l.foreach { case (h, v) => buf = BottomK.insert(buf, h, v, k) }
      var rbuf: (Int, Array[Long], Array[Long]) =
        (0, Array.emptyLongArray, Array.emptyLongArray)
      r.foreach { case (h, v) => rbuf = BottomK.insert(rbuf, h, v, k) }
      (0 until rbuf._1).foreach(i =>
        buf = BottomK.insert(buf, rbuf._2(i), rbuf._3(i), k))
      val got = (0 until buf._1).map(i => (buf._2(i), buf._3(i))).sorted
      val want = items.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1).take(k)
        .sorted
      assert(got == want, s"trial $trial k=$k n=$n")
    }
  }
}
