package graft.llm

import graft.SparkSpec

/** Sequence packing: invariants plus a hand-checked tiny corpus. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c"),           // 3 tokens, span [0, 3)
    (2L, "d e f g h"),       // 5 tokens, span [3, 8)
    (3L, ""),                // empty — contributes nothing
    (5L, "i j"),             // 2 tokens, span [8, 10)
    (9L, "k l m n")          // 4 tokens, span [10, 14)
  ).toDF("doc_id", "text")

  test("capacity-4 packing on a hand-checked corpus") {
    val got = Packing.packSequences(docs, capacity = 4, bucketSize = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2))
      .toSeq
    // token stream: a b c | d e f g h | i j | k l m n  (14 tokens)
    // packs of 4:  [a b c d] [e f g h] [i j k l] [m n]
    assert(got == Seq(
      (0L, 1L, 1L, 3L, "a b c"),
      (0L, 2L, 1L, 1L, "d"),
      (1L, 2L, 2L, 4L, "e f g h"),
      (2L, 5L, 1L, 2L, "i j"),
      (2L, 9L, 1L, 2L, "k l"),
      (3L, 9L, 3L, 2L, "m n")))
  }

  test("every pack but the last is exactly full; doc segments tile the doc") {
    val corpus = (0L until 200L).map(i =>
      (i * 3L, Seq.fill((i % 7L).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val packs = Packing.packSequences(corpus, capacity = 16, bucketSize = 32L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val byPack = packs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastPack = byPack.keys.max
    byPack.foreach { case (pid, tok) =>
      if (pid != lastPack) assert(tok == 16L, s"pack $pid has $tok tokens")
    }
    val total = (0L until 200L).map(i => (i % 7L) + 1).sum
    assert(packs.map(_._4).sum == total)

    // each doc's segments are contiguous from 1 to its token count
    packs.groupBy(_._2).foreach { case (docId, segs) =>
      val sorted = segs.sortBy(_._1)
      var next = 1L
      sorted.foreach { case (_, _, segStart, segTok) =>
        assert(segStart == next, s"doc $docId gap at $segStart (want $next)")
        next += segTok
      }
      assert(next - 1 == (docId / 3 % 7) + 1)
    }
  }

  test("bucketSize does not change the result (two-phase prefix is exact)") {
    val a = Packing.packSequences(docs, capacity = 4, bucketSize = 1L)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Packing.packSequences(docs, capacity = 4, bucketSize = 1000L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
