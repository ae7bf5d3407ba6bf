package graft.datapipe

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val tone: Array[Short] = Array.tabulate(1000)(i => ((i * 37) % 2000 - 1000).toShort)

  test("PCM16 encode/decode round-trips samples and rate exactly") {
    val bytes = Multimodal.encodeWavPcm16(tone, 8000)
    assert(bytes.length == 44 + 2000)
    val (sr, back) = Multimodal.decodeWavPcm16(bytes)
    assert(sr == 8000 && back.sameElements(tone))
  }

  test("decoder walks unknown chunks (with odd-size padding) to find fmt/data") {
    val base = Multimodal.encodeWavPcm16(tone, 16000)
    // Splice a 7-byte LIST chunk (padded to 8) between WAVE and fmt.
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ Array.fill[Byte](7 + 1)(0x5A)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // Fix the RIFF size field (little-endian at offset 4).
    val riffLen = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xFF).toByte
    val (sr, back) = Multimodal.decodeWavPcm16(spliced)
    assert(sr == 16000 && back.sameElements(tone))
  }

  test("decoder rejects stereo, non-PCM, truncated data, and non-WAV bytes") {
    val good = Multimodal.encodeWavPcm16(tone, 8000)
    val stereo = good.clone(); stereo(22) = 2 // numChannels
    assertThrows[IllegalArgumentException](Multimodal.decodeWavPcm16(stereo))
    val float32 = good.clone(); float32(20) = 3 // audioFormat = IEEE float
    assertThrows[IllegalArgumentException](Multimodal.decodeWavPcm16(float32))
    assertThrows[IllegalArgumentException](Multimodal.decodeWavPcm16(good.take(100)))
    assertThrows[IllegalArgumentException](
      Multimodal.decodeWavPcm16("not audio at all, just text bytes".getBytes))
  }

  test("synth + decode features match the closed form on a DataFrame") {
    val ids = Seq(0L, 1L, 4L, 97L).toDF("doc_id")
    val out = Multimodal.decodeWavFeatures(Multimodal.synthWav(ids, "doc_id"))
      .as[(Long, Int, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- Seq(0L, 1L, 4L, 97L)) {
      val n = 400 + (id % 5) * 200
      val vs = (0L until n).map(i => ((id * 31 + i * 7) % 2048) - 1024)
      val sumSq = vs.map(v => v * v).sum
      val (_, sr, nS, durMs, peak, sq, rms) = out(id)
      assert(sr == 8000 && nS == n && durMs == n * 1000 / 8000)
      assert(peak == vs.map(math.abs).max && sq == sumSq)
      assert(rms == math.sqrt(sumSq.toDouble / n.toDouble))
    }
  }

  private def transcodeOne(samples: Array[Short], factor: Int, gNum: Int, gDen: Int): (Int, Array[Short]) = {
    val media = Seq((1L, Multimodal.encodeWavPcm16(samples, 8000))).toDF("media_id", "content")
    val out = Multimodal.transcodeWav(media, factor, gNum, gDen).collect().head
    Multimodal.decodeWavPcm16(out.getAs[Array[Byte]](1))
  }

  test("transcode: block mean is floor-exact on negative sums") {
    // Block (-3, 0) sums to -3: floorDiv(-3, 2) = -2, NOT -1.
    val (sr, out) = transcodeOne(Array[Short](-3, 0, 3, 0), 2, 1, 1)
    assert(sr == 4000)
    assert(out.toSeq == Seq[Short](-2, 1))
  }

  test("transcode: gain saturates at the PCM16 rails") {
    val (_, out) = transcodeOne(Array[Short](30000, 30000, -30000, -30000, 10, 10), 2, 81, 2)
    assert(out.toSeq == Seq[Short](32767, -32768, 405))
  }

  test("transcode: tail partial block is dropped") {
    val (_, out) = transcodeOne(Array[Short](10, 20, 99), 2, 1, 1)
    assert(out.toSeq == Seq[Short](15))
  }

  test("transcode: factor 1 with unit gain is the identity") {
    val (sr, out) = transcodeOne(tone, 1, 1, 1)
    assert(sr == 8000 && out.sameElements(tone))
  }

  test("transcode: non-divisible sample rate is rejected, not silently truncated") {
    // 8000/3 would write a 2666 Hz header over a 2666.67 Hz stream —
    // the same honest divisibility contract transcodeAvi enforces.
    val ex = intercept[org.apache.spark.SparkException] {
      transcodeOne(tone, 3, 1, 1)
    }
    assert(ex.getMessage.contains("not divisible") ||
      Option(ex.getCause).exists(_.getMessage.contains("not divisible")))
  }

  test("frame features: hand-computed energy, peak, and in-frame zero crossings") {
    // frameLen 4 over 10 samples: frames [3,-2,5,0] [0,-1,1,-1]; the
    // 2-sample tail [7,7] drops. Crossings are STRICT sign products:
    // frame 0 has 3*-2<0 and -2*5<0 (5*0 is not), frame 1 has
    // -1*1<0 and 1*-1<0 (0*-1 is not — boundary 0 never crosses).
    val samples = Array[Short](3, -2, 5, 0, 0, -1, 1, -1, 7, 7)
    val media = Seq((9L, Multimodal.encodeWavPcm16(samples, 8000))).toDF("media_id", "content")
    val got = Multimodal.wavFrameFeatures(media, frameLen = 4)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.length == 2)
    assert(got(0) == ((9L, 0, 9L + 4L + 25L + 0L, 5L, 2L)))
    assert(got(1) == ((9L, 1, 0L + 1L + 1L + 1L, 1L, 2L)))
  }

  test("frame features: a frame boundary never counts a cross-frame crossing") {
    // samples ..., -8 | 8, ...: adjacent across the frame boundary with
    // opposite signs — must NOT count in either frame.
    val samples = Array[Short](1, -8, 8, 1)
    val media = Seq((1L, Multimodal.encodeWavPcm16(samples, 8000))).toDF("media_id", "content")
    val got = Multimodal.wavFrameFeatures(media, frameLen = 2)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._5).toSeq == Seq(1L, 0L))
  }

  test("fingerprint: hand-computed cycled energy-delta bits; rises set, falls and ties clear") {
    // frameLen 2, frames: [3,0] e=9, [4,0] e=16, [2,0] e=4, [2,0] e=4, tail [9] drops.
    // deltas: 9->16 rise, 16->4 fall, 4->4 tie. Cycled: bit i = delta
    // (i mod 3) -> every i ≡ 0 (mod 3) is set, others clear.
    val samples = Array[Short](3, 0, 4, 0, 2, 0, 2, 0, 9)
    val media = Seq((1L, Multimodal.encodeWavPcm16(samples, 8000))).toDF("media_id", "content")
    val got = Multimodal.wavFingerprint(media, frameLen = 2)
      .as[(Long, Int, Long)].collect().head
    var expect = 0L
    for (i <- 0 until 64 if i % 3 == 0) expect |= 1L << i
    assert(got._2 == 4 && got._3 == expect)
  }

  test("fingerprint: every 16-bit chunk carries signal for the SHORTEST clip (no degenerate buckets)") {
    // n=400 -> 25 frames -> 24 deltas; cycling must populate all four
    // chunks (a 'first 64 deltas' scheme would zero bits 24-63 and
    // collapse the candidate buckets at corpus scale).
    val hashes = Multimodal.wavFingerprint(
        Multimodal.synthWav((0L until 40L by 5L).toDF("doc_id"), "doc_id"), frameLen = 16)
      .as[(Long, Int, Long)].collect()
    val shortClips = hashes.filter(_._2 == 25)
    assert(shortClips.nonEmpty, "fixture must include 400-sample clips")
    (0 until 4).foreach { chunk =>
      val varied = shortClips.map(h => (h._3 >>> (chunk * 16)) & 0xFFFFL).distinct
      assert(varied.size > 1, s"chunk $chunk is constant across short clips — degenerate bucket")
    }
  }

  test("fingerprint: the planted one-LSB retouch pair stays within the Hamming-3 recall bound") {
    val hashes = Multimodal.wavFingerprint(
        Multimodal.synthWavPair((0L until 20L).toDF("doc_id"), "doc_id"), frameLen = 16)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._3).toMap
    (0L until 20L).foreach { id =>
      val d = java.lang.Long.bitCount(hashes(id * 2) ^ hashes(id * 2 + 1))
      // one delta moved, cycled at most ceil(64/24) = 3 times
      assert(d <= 3, s"id $id: retouch moved $d bits")
    }
  }
}
