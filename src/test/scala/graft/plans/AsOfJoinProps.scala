package graft.plans

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Randomized equivalence: the native AsOfJoinExec must agree with
  * the composed union+window asOf on arbitrary keyed time series —
  * ties, duplicate left timestamps, keys with no right rows, right
  * rows after every left row, single-key pileups (partition skew),
  * and empty sides.
  */
object AsOfJoinProps extends Properties("AsOfJoinExec") {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val keyGen = Gen.chooseNum(0L, 5L)      // few keys -> dense collisions
  private val tsGen = Gen.chooseNum(0L, 50L)      // small ts range -> many ties
  private val leftGen = Gen.listOf(Gen.zip(keyGen, tsGen)).map(_.take(60))
  private val rightGen = Gen.listOf(Gen.zip(keyGen, tsGen)).map(_.take(60))

  property("native == composed on random keyed series") =
    Prop.forAll(leftGen, rightGen) { (lRaw, rRaw) =>
      val left = lRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "ts_us", "lid")
      // Right must be unique per (key, ts) for determinism — the
      // operator's documented contract; aggregate like real callers.
      val right = rRaw.toDF("k", "ts_us")
        .groupBy("k", "ts_us").agg(count(lit(1)).as("payload"))
      def collect(df: org.apache.spark.sql.DataFrame) = df
        .select($"lid", $"asof_payload")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      val native = collect(NativeAsOf.asOf(left, right, "k", "ts_us", Seq("payload")))
      val composed = collect(graft.ops.TemporalJoins.asOf(left, right, "k", "ts_us", Seq("payload")))
      Prop(native == composed) :| s"native=$native composed=$composed"
    }
}
