package graft.oracle

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks the oracle-side Scala XXH64/FNV references bit-for-bit
  * against the ENGINE's production hashes (Spark `xxhash64`,
  * graft SimHash64.wordHash) across every length class the tail
  * logic branches on — the foundation under the generated DuckDB
  * replay SQL.
  */
class Xxh64RefSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // Lengths straddling every XXH64 branch: empty, byte tail, 4-byte
  // lane, 8-byte words, one stripe, stripe+tail, several stripes;
  // plus multi-byte UTF-8.
  private val words: Seq[String] =
    (0 to 40).map(n => "abcdefghij" * 5 take n) ++
      Seq("héllo wörld", "ñ", "日本語テキスト", "x" * 31, "y" * 32, "z" * 33,
        "mixed éñ 漢字 tail", "a b c d e f g h", "", "word", "0", "ab|cd",
        "q" * 63, "r" * 64, "s" * 65, "t" * 100)

  test("hashIntThenString matches Spark xxhash64(lit(i), w) for all seeds and tail branches") {
    for (i <- 0 until 16) {
      val got = words.toDF("w").select(xxhash64(lit(i), col("w"))).as[Long].collect().toSeq
      val want = words.map(w => Xxh64Ref.hashIntThenString(i, w))
      assert(got == want, s"seed index $i")
    }
  }

  test("chainLongs matches Spark xxhash64 over long columns") {
    val fixtures = Seq(
      Seq(0L, 0L, 0L, 0L),
      Seq(1L, -1L, Long.MaxValue, Long.MinValue),
      Seq(42L, 4242L, -987654321098765L, 5L),
      Seq(-2L, 3L, -5L, 7L))
    val got = fixtures.map { ls =>
      spark.range(1).select(xxhash64(ls.map(lit): _*)).as[Long].head()
    }
    assert(got == fixtures.map(ls => Xxh64Ref.chainLongs(ls)))
  }

  test("single-value hash paths match Spark for ints and longs") {
    val ints = Seq(0, 1, -1, 42, Int.MaxValue, Int.MinValue, 123456789)
    val gotI = ints.toDF("i").select(xxhash64(col("i"))).as[Long].collect().toSeq
    assert(gotI == ints.map(i => Xxh64Ref.hashInt(i, 42L)))
    val longs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L)
    val gotL = longs.toDF("l").select(xxhash64(col("l"))).as[Long].collect().toSeq
    assert(gotL == longs.map(l => Xxh64Ref.hashLong(l, 42L)))
  }

  test("FnvRef.wordHash matches the SimHash64 production word hash") {
    import org.apache.spark.unsafe.types.UTF8String
    for (w <- words)
      assert(FnvRef.wordHash(w) == graft.functions.SimHash64.wordHash(UTF8String.fromString(w)), s"word '$w'")
  }
}
