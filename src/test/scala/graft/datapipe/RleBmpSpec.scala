package graft.datapipe

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class RleBmpSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tokens(bytes: Array[Byte]): Seq[(Int, Int)] = {
    // Walk the encoded stream and return (b1, b2) token heads — lets
    // tests assert which token TYPES an image actually produced.
    val dataOffset = 54 + 256 * 4
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = dataOffset
    var done = false
    while (!done && pos + 1 < bytes.length) {
      val b1 = bytes(pos) & 0xFF; val b2 = bytes(pos + 1) & 0xFF
      out += ((b1, b2))
      pos += 2
      if (b1 == 0 && b2 == 1) done = true
      else if (b1 == 0 && b2 == 2) pos += 2
      else if (b1 == 0 && b2 >= 3) pos += b2 + (b2 & 1)
    }
    out.toSeq
  }

  test("RLE8 encode/decode round-trips runs, literals, and mixed rows exactly") {
    val w = 13; val h = 7 // odd width exercises absolute-block padding
    val px = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      if (y % 2 == 0) (x / 4).toByte          // runs of 4 (+ leftover)
      else ((y * 31 + x * 17) % 256).toByte    // no runs: literals
    }
    val bytes = Multimodal.encodeBmpRle8(w, h, px)
    val (dw, dh, back) = Multimodal.decodeBmpRle8(bytes)
    assert(dw == w && dh == h && back.sameElements(px))
    val ts = tokens(bytes)
    assert(ts.exists { case (b1, _) => b1 >= 3 }, "encoded runs present")
    assert(ts.exists { case (b1, b2) => b1 == 0 && b2 >= 3 }, "absolute blocks present")
    assert(ts.count { case (b1, b2) => b1 == 0 && b2 == 0 } == h - 1, "EOL per row but the last")
    assert(ts.last == ((0, 1)), "stream ends with end-of-bitmap")
  }

  test("a runny image genuinely compresses below its raw pixel size") {
    val w = 64; val h = 32
    val px = Array.tabulate(w * h)(i => ((i / w) % 7).toByte) // constant rows
    val bytes = Multimodal.encodeBmpRle8(w, h, px)
    val streamLen = bytes.length - (54 + 1024)
    assert(streamLen < w * h / 8, s"constant rows must RLE far below raw: $streamLen")
    val (_, _, back) = Multimodal.decodeBmpRle8(bytes)
    assert(back.sameElements(px))
  }

  test("single-pixel leftovers and 255-run caps round-trip") {
    val w = 300; val h = 2 // one run longer than 255, plus a ragged tail
    val px = Array.tabulate(w * h) { i =>
      if (i / w == 0) 9.toByte else ((i * 13) % 256).toByte
    }
    val (_, _, back) = Multimodal.decodeBmpRle8(Multimodal.encodeBmpRle8(w, h, px))
    assert(back.sameElements(px))
  }

  test("decoder handles delta escapes by leaving skipped pixels zero") {
    // Hand-built stream: bottom row = 2 pixels of 5, delta right 1 up 1,
    // then 1 pixel of 7, end. Image 4x3 bottom-up.
    val w = 4; val h = 3
    val stream = Array[Int](2, 5, 0, 2, 1, 1, 1, 7, 0, 1).map(_.toByte)
    val dataOffset = 54 + 1024
    val buf = java.nio.ByteBuffer.allocate(dataOffset + stream.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(dataOffset + stream.length)
      .putShort(0).putShort(0).putInt(dataOffset)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(8)
      .putInt(1).putInt(stream.length)
      .putInt(2835).putInt(2835).putInt(256).putInt(0)
    (0 until 256).foreach(c => buf.put(c.toByte).put(c.toByte).put(c.toByte).put(0.toByte))
    stream.foreach(buf.put)
    val (_, _, px) = Multimodal.decodeBmpRle8(buf.array())
    // Bottom row (output row h-1=2): 5,5,0,0; delta moved to (x=3,y=1)
    // → output row 1 x 3 = 7; everything else 0.
    assert(px((h - 1) * w).toInt == 5 && px((h - 1) * w + 1).toInt == 5)
    assert(px(1 * w + 3).toInt == 7)
    assert(px.map(_ & 0xFF).sum == 5 + 5 + 7, "skipped pixels stay zero")
  }

  test("decoder rejects uncompressed, 24bpp, top-down, and unterminated input") {
    val px = Array.tabulate(16)(i => i.toByte)
    val good = Multimodal.encodeBmpRle8(4, 4, px)
    val uncompressed = good.clone(); uncompressed(30) = 0
    assertThrows[IllegalArgumentException](Multimodal.decodeBmpRle8(uncompressed))
    val bpp24 = good.clone(); bpp24(28) = 24
    assertThrows[IllegalArgumentException](Multimodal.decodeBmpRle8(bpp24))
    val topDown = good.clone()
    for (i <- 0 until 4) topDown(22 + i) = (((-4) >> (8 * i)) & 0xFF).toByte
    assertThrows[IllegalArgumentException](Multimodal.decodeBmpRle8(topDown))
    assertThrows[IllegalArgumentException](
      Multimodal.decodeBmpRle8(good.dropRight(2))) // missing EOB
    assertThrows[IllegalArgumentException](
      Multimodal.decodeBmpRle8(Multimodal.encodeBmp24(2, 2, new Array[Byte](12))))
  }

  test("synth + decode features match the closed form on a DataFrame") {
    val ids = Seq(0L, 3L, 50L, 97L).toDF("doc_id")
    val out = Multimodal.decodeRleFeatures(Multimodal.synthRleBmp(ids, "doc_id"))
      .as[(Long, Int, Int, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- Seq(0L, 3L, 50L, 97L)) {
      val ew = (8 + id % 9).toInt
      val eh = (8 + id % 7).toInt
      val vs = (0 until ew * eh).map { i =>
        val y = i / ew; val x = i % ew
        if (y % 3 == 2) (id + y + 13L * x) % 256 else (id * 31 + 7L * y + x / 4) % 256
      }
      val (_, dw, dh, npx, sum, wsum, nbytes, mean) = out(id)
      assert(dw == ew && dh == eh && npx == ew.toLong * eh)
      assert(sum == vs.sum)
      assert(wsum == vs.zipWithIndex.map { case (v, i) => v * (i % 251) }.sum)
      assert(nbytes > 1078, "content carries header + palette + stream")
      assert(mean == vs.sum.toDouble / (ew * eh).toDouble)
    }
  }
}
