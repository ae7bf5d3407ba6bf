package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DhashSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def pairMedia(ids: Seq[Long]) =
    Multimodal.synthBmpPair(ids.toDF("doc_id"), "doc_id")

  test("dhash is deterministic and identical images hash identically") {
    val m = pairMedia(Seq(3L))
    val again = Multimodal.dhashBmp(m).unionByName(Multimodal.dhashBmp(m))
      .groupBy(col("media_id")).agg(countDistinct(col("dhash")).as("n"))
      .as[(Long, Long)].collect()
    assert(again.forall(_._2 == 1L))
  }

  test("a one-pixel retouch flips only the two top-left comparison bits") {
    val hashes = Multimodal.dhashBmp(pairMedia((0L until 30L)))
      .as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    (0L until 30L).foreach { id =>
      val diff = hashes(id * 2) ^ hashes(id * 2 + 1)
      assert((diff & ~3L) == 0L,
        s"id $id: retouch must only touch bits 0/1, got diff ${diff.toBinaryString}")
    }
  }

  test("distinct source images land far apart; planted pairs are found losslessly") {
    val ids = (0L until 30L)
    val sketches = Multimodal.dhashBmp(pairMedia(ids))
    val pairs = Dedup.sketchHammingPairs(sketches, "media_id", "dhash", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    // brute-force ground truth over the same sketch set
    val hs = sketches.select(col("media_id"), col("dhash")).as[(Long, Long)].collect()
    val brute = for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)
    assert(pairs.toSet == brute.toSet,
      "pigeonhole candidates must equal the brute-force Hamming-3 pair set")
    // every planted retouch pair present
    ids.foreach { id =>
      assert(pairs.exists(p => p._1 == id * 2 && p._2 == id * 2 + 1),
        s"planted pair for id $id missing")
    }
  }

  test("video frames hash independently; everyNth sampling keeps only the cadence") {
    val media = Multimodal.synthAvi(Seq(3L, 6L).toDF("doc_id"), "doc_id")
    val all = Multimodal.dhashAviFrames(media, everyNth = 1)
      .as[(Long, Int, Long)].collect()
    // synthAvi: nf = 2 + id % 4 -> id 3 has 5 frames, id 6 has 4.
    assert(all.count(_._1 == 3L) == 5 && all.count(_._1 == 6L) == 4)
    // consecutive frames shift every byte by 11 — hashes must differ
    val byClip = all.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
    byClip.foreach { case (id, hs) =>
      assert(hs.distinct.size > 1, s"clip $id frames all hashed identically")
    }
    val sampled = Multimodal.dhashAviFrames(media, everyNth = 2)
      .as[(Long, Int, Long)].collect()
    assert(sampled.forall(_._2 % 2 == 0))
    // sampled hashes must be exactly the even-index subset of the full set
    assert(sampled.toSet == all.filter(_._2 % 2 == 0).toSet)
  }

  test("clip XOR signatures: the one-frame retouch pair stays within 2 bits and is found") {
    val media = Multimodal.synthAviPair((0L until 25L).toDF("doc_id"), "doc_id")
    val sigs = Multimodal.dhashAviFrames(media, everyNth = 1)
      .groupBy(col("media_id"))
      .agg(org.apache.spark.sql.functions.expr("bit_xor(dhash)").as("sig"))
    val sigMap = sigs.as[(Long, Long)].collect().toMap
    (0L until 25L).foreach { id =>
      val d = java.lang.Long.bitCount(sigMap(id * 2) ^ sigMap(id * 2 + 1))
      assert(d <= 2, s"id $id: one-frame retouch moved $d signature bits")
    }
    val pairs = Dedup.sketchHammingPairs(sigs, "media_id", "sig", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    (0L until 25L).foreach { id =>
      assert(pairs.exists(p => p._1 == id * 2 && p._2 == id * 2 + 1),
        s"planted clip pair for id $id missing")
    }
  }

  test("grid sampling matches a hand-computed hash on a tiny synthetic image") {
    // 9x8 image: gray strictly increases left to right on every row, so
    // every comparison bit is 1 except none — hash = all 64 bits set.
    val w = 9; val h = 8
    val rgb = Array.tabulate(w * h * 3) { i =>
      val px = i / 3
      val x = px % w
      (x * 20).toByte // same per channel; gray = 3 * 20 * x, strictly increasing
    }
    val media = Seq((7L, Multimodal.encodeBmp24(w, h, rgb))).toDF("media_id", "content")
    val got = Multimodal.dhashBmp(media).select(col("dhash")).as[Long].head()
    assert(got == -1L, s"monotone rows must set all 64 bits, got ${got.toBinaryString}")
  }
}
