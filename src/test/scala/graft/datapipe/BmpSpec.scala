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

  test("resize: nearest-neighbor index map, identity at same size, corner pixels") {
    val w = 8; val h = 6
    val rgb = Array.tabulate(w * h * 3)(i => (i % 256).toByte)
    val media = Seq((1L, Multimodal.encodeBmp24(w, h, rgb))).toDF("media_id", "content")
    // Identity resize round-trips the exact pixels.
    val same = Multimodal.resizeBmp(media, w, h).collect().head.getAs[Array[Byte]](1)
    assert(Multimodal.decodeBmp24(same)._3.sameElements(rgb))
    // 2x2: dst(0,0) = src(0,0); dst(1,1) = src(x=1*8/2=4, y=1*6/2=3).
    val small = Multimodal.decodeBmp24(
      Multimodal.resizeBmp(media, 2, 2).collect().head.getAs[Array[Byte]](1))
    assert(small._1 == 2 && small._2 == 2)
    val out = small._3
    assert(out.slice(0, 3).sameElements(rgb.slice(0, 3)))
    val srcIdx = (3 * w + 4) * 3
    assert(out.slice(9, 12).sameElements(rgb.slice(srcIdx, srcIdx + 3)))
  }
}
