package graft.datapipe

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class AviSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 7 px wide: row stride 21 bytes pads to 24, so the per-frame padding
  // path is genuinely exercised (a multiple-of-4 width would hide it).
  private val w = 7
  private val h = 5
  private val nf = 3
  private def frame(f: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(j => ((f * 97 + j * 11) % 256).toByte)
  private val frames: Array[Array[Byte]] = Array.tabulate(nf)(frame)

  test("uncompressed AVI encode/decode round-trips frames exactly, in order") {
    val bytes = Multimodal.encodeAvi(w, h, 12, frames)
    val (dw, dh, fps, back) = Multimodal.decodeAvi(bytes)
    assert(dw == w && dh == h && fps == 12)
    assert(back.length == nf)
    for (f <- 0 until nf)
      assert(back(f).sameElements(frames(f)), s"frame $f must round-trip byte-exact")
  }

  test("decoder skips unknown chunks (idx1-style) between frames") {
    val bytes = Multimodal.encodeAvi(w, h, 12, frames)
    // Splice a JUNK chunk right after the movi LIST header (12 bytes in
    // front of the first '00db'): a correct walker skips it and still
    // finds every frame. The movi/riff declared sizes grow accordingly.
    val moviHdr = {
      var i = bytes.length - 1
      // find the 'movi' list: scan for LIST....movi
      val pat = "movi".getBytes("US-ASCII")
      i = bytes.indexOfSlice(pat)
      i
    }
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 6) // odd-size handling not needed: 6 is even
    val insertAt = moviHdr + 4 // right after the 'movi' type fourcc
    val spliced = bytes.take(insertAt) ++ junk ++ bytes.drop(insertAt)
    def patchInt(arr: Array[Byte], off: Int, delta: Int): Unit = {
      val old = (arr(off) & 0xFF) | ((arr(off + 1) & 0xFF) << 8) |
        ((arr(off + 2) & 0xFF) << 16) | ((arr(off + 3) & 0xFF) << 24)
      val nv = old + delta
      for (b <- 0 until 4) arr(off + b) = ((nv >> (8 * b)) & 0xFF).toByte
    }
    patchInt(spliced, 4, junk.length)           // RIFF size
    patchInt(spliced, moviHdr - 4, junk.length) // movi LIST size
    val (_, _, _, back) = Multimodal.decodeAvi(spliced)
    assert(back.length == nf, "frames after a junk chunk must still decode")
    for (f <- 0 until nf) assert(back(f).sameElements(frames(f)))
  }

  test("decoder rejects non-AVI bytes, compressed streams, and bad frame sizes") {
    assertThrows[IllegalArgumentException](
      Multimodal.decodeAvi("definitely not a video".getBytes))
    // A WAV is valid RIFF but not AVI.
    assertThrows[IllegalArgumentException](
      Multimodal.decodeAvi(Multimodal.encodeWavPcm16(Array[Short](1, 2, 3), 8000)))
    val good = Multimodal.encodeAvi(w, h, 12, frames)
    // strf biCompression lives 16 bytes into BITMAPINFOHEADER.
    val strfOff = good.indexOfSlice("strf".getBytes("US-ASCII")) + 8
    val rle = good.clone(); rle(strfOff + 16) = 1
    assertThrows[IllegalArgumentException](Multimodal.decodeAvi(rle))
    val bpp8 = good.clone(); bpp8(strfOff + 14) = 8
    assertThrows[IllegalArgumentException](Multimodal.decodeAvi(bpp8))
  }

  test("sampleAviFrames keeps every-nth frame with per-frame closed-form features") {
    val ids = Seq(3L, 7L).toDF("doc_id")
    val out = Multimodal.sampleAviFrames(Multimodal.synthAvi(ids, "doc_id"), everyNth = 2)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (id <- Seq(3L, 7L)) {
      val ew = (8 + id % 6).toInt
      val eh = (6 + id % 5).toInt
      val enf = (2 + id % 4).toInt
      val expectIdx = (0 until enf).filter(_ % 2 == 0)
      val got = out(id)
      assert(got.map(_._2).toSeq == expectIdx, s"sampled frame indexes for $id")
      for ((_, f, w, h, s, pw) <- got) {
        assert(w == ew && h == eh)
        val vs = (0 until ew * eh * 3).map(j => (id * 31 + f * 11 + j * 7) % 256)
        assert(s == vs.sum)
        assert(pw == vs.zipWithIndex.map { case (v, j) => v * (j % 251) }.sum)
      }
    }
  }

  test("synth + decode features match the closed form on a DataFrame") {
    val ids = Seq(0L, 1L, 10L, 97L).toDF("doc_id")
    val out = Multimodal.decodeAviFeatures(Multimodal.synthAvi(ids, "doc_id"))
      .as[(Long, Int, Int, Int, Int, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- Seq(0L, 1L, 10L, 97L)) {
      val ew = (8 + id % 6).toInt
      val eh = (6 + id % 5).toInt
      val enf = (2 + id % 4).toInt
      val vs = for (f <- 0 until enf; j <- 0 until ew * eh * 3)
        yield (f, j, (id * 31 + f * 11 + j * 7) % 256)
      val (_, dw, dh, fps, dnf, npx, sum, fw, pw, mean) = out(id)
      assert(dw == ew && dh == eh && fps == 12 && dnf == enf)
      assert(npx == ew.toLong * eh * enf)
      assert(sum == vs.map(_._3).sum)
      assert(fw == vs.map { case (f, _, v) => (f + 1) * v }.sum)
      assert(pw == vs.map { case (_, j, v) => v * (j % 251) }.sum)
      assert(mean == vs.map(_._3).sum.toDouble / (ew * eh * 3 * enf).toDouble)
    }
  }
}
