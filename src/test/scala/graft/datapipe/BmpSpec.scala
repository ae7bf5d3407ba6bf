package graft.datapipe

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class BmpSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 7 px wide: row stride 21 bytes pads to 24, so the padding path is
  // genuinely exercised (a multiple-of-4 width would hide a stride bug).
  private val w = 7
  private val h = 5
  private val rgb: Array[Byte] = Array.tabulate(w * h * 3)(i => ((i * 11) % 256).toByte)

  test("24bpp encode/decode round-trips pixels exactly through padding and BGR") {
    val bytes = Multimodal.encodeBmp24(w, h, rgb)
    assert(bytes.length == 54 + 24 * h, "rows must pad to 4-byte boundaries")
    val (dw, dh, back) = Multimodal.decodeBmp24(bytes)
    assert(dw == w && dh == h && back.sameElements(rgb))
  }

  test("decoder honors negative height (top-down row order)") {
    val bytes = Multimodal.encodeBmp24(w, h, rgb)
    // Rewrite height to -h: pixel rows are now declared top-down, so a
    // correct decoder must read them in the opposite order — the result
    // is the original image vertically flipped.
    val negH = -h
    for (i <- 0 until 4) bytes(22 + i) = ((negH >> (8 * i)) & 0xFF).toByte
    val (_, dh, flipped) = Multimodal.decodeBmp24(bytes)
    assert(dh == h)
    val expected = Array.tabulate(w * h * 3) { d =>
      val y = d / (w * 3); val rest = d % (w * 3)
      rgb((h - 1 - y) * w * 3 + rest)
    }
    assert(flipped.sameElements(expected), "negative height must flip the row order")
  }

  test("decoder rejects non-BMP bytes, 8bpp, compressed, and truncated data") {
    val good = Multimodal.encodeBmp24(w, h, rgb)
    assertThrows[IllegalArgumentException](
      Multimodal.decodeBmp24("definitely not an image".getBytes))
    val bpp8 = good.clone(); bpp8(28) = 8 // bits/pixel
    assertThrows[IllegalArgumentException](Multimodal.decodeBmp24(bpp8))
    val rle = good.clone(); rle(30) = 1 // BI_RLE8 compression
    assertThrows[IllegalArgumentException](Multimodal.decodeBmp24(rle))
    assertThrows[IllegalArgumentException](Multimodal.decodeBmp24(good.take(80)))
  }

  test("synth + decode features match the closed form on a DataFrame") {
    val ids = Seq(0L, 1L, 8L, 97L).toDF("doc_id")
    val out = Multimodal.decodeBmpFeatures(Multimodal.synthBmp(ids, "doc_id"))
      .as[(Long, Int, Int, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- Seq(0L, 1L, 8L, 97L)) {
      val ew = (8 + id % 9).toInt
      val eh = (8 + id % 7).toInt
      val vs = (0 until ew * eh * 3).map(i => (id * 31 + i * 7) % 256)
      val (_, dw, dh, npx, sr, sg, sb, wsum, mean) = out(id)
      assert(dw == ew && dh == eh && npx == ew.toLong * eh)
      assert(sr == vs.zipWithIndex.collect { case (v, i) if i % 3 == 0 => v }.sum)
      assert(sg == vs.zipWithIndex.collect { case (v, i) if i % 3 == 1 => v }.sum)
      assert(sb == vs.zipWithIndex.collect { case (v, i) if i % 3 == 2 => v }.sum)
      assert(wsum == vs.zipWithIndex.map { case (v, i) => v * (i % 251) }.sum)
      assert(mean == vs.sum.toDouble / (ew * eh * 3).toDouble)
    }
  }
}
