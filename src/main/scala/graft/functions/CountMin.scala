package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") — point
  * frequency estimates over a stream in d·w longs of state.
  *
  * `cm_agg(value, w, d)` folds a group's values into a d×w counter
  * grid; `cm_estimate(sketch, value)` answers "about how often did
  * THIS value occur" for any probe, including probes chosen long
  * after the scan — the post-hoc point-lookup the SpaceSaving top-k
  * summary cannot answer (it only retains the heavy entries). The
  * estimate is min over the d rows of the probe's counter:
  * never an undercount, overcount bounded by 2N/w with probability
  * 1 − 2^−d.
  *
  * Plan shape at scale: ordinary partial aggregation — executors fold
  * partitions into local grids, only d·w·8-byte grids shuffle, merge
  * is element-wise addExact. The hash family is the engine's portable
  * md5 discipline (row i salts with "cm<i>"), so a DuckDB oracle
  * recomputes every counter and every min-estimate value-exactly.
  *
  * The sketch serializes with a (d, w) header, so `cm_estimate`
  * validates it probes the grid it was given rather than trusting the
  * caller to repeat the right literals.
  */
@ExpressionDescription(
  usage = "cm_agg(value, w, d) - d-by-w count-min counter grid over the group's values.")
case class CountMinAgg(
    first: Expression,   // value (string)
    second: Expression,  // w: buckets per row (int literal)
    third: Expression,   // d: hash rows (int literal)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with TernaryLike[Expression] {

  private lazy val w: Int = second.eval().asInstanceOf[Int]
  private lazy val d: Int = third.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string value, got ${first.dataType.sql}")
    else if (!second.foldable || !third.foldable ||
      second.dataType != IntegerType || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects literal int w and d")
    else
      (FoldableLiteral.int(prettyName, "w", second),
        FoldableLiteral.int(prettyName, "d", third)) match {
        case (Left(f), _) => f
        case (_, Left(f)) => f
        case (Right(wv), Right(dv)) =>
          if (wv < 2 || wv > (1 << 22) || dv < 1 || dv > 16)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName needs w in [2, 2^22] and d in [1, 16], got w=$wv d=$dv")
          else TypeCheckResult.TypeCheckSuccess
      }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // Buffer layout: [0]=d, [1]=w, then d*w counters row-major.
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](2 + d * w)
    b(0) = d; b(1) = w
    b
  }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < d) {
        b(2 + i * w + CountMin.bucket(s, i, w)) += 1
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 2
    while (i < b.length) { b(i) = Math.addExact(b(i), o(i)); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = BitmapDistinct.toBytes(b)
  override def serialize(b: Array[Long]): Array[Byte] = BitmapDistinct.toBytes(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapDistinct.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CountMinAgg =
    copy(first = f, second = s, third = t)
}

/** `cm_merge_agg(sketch)` — element-wise sum of PRE-BUILT count-min
  * grids: the rollup aggregate for a persisted sketch table (per-day
  * grids sum to any coarser period, and the summed grid's estimates
  * are exactly the estimates of a flat single-pass grid — CM is
  * linear). Dimensions are taken from the first sketch; mismatched
  * (d, w) fail loudly.
  */
@ExpressionDescription(
  usage = "cm_merge_agg(sketch) - element-wise sum of cm_agg grids.")
case class CountMinMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def addInto(b: Array[Long], o: Array[Long]): Array[Long] =
    if (o.isEmpty) b
    else if (b.isEmpty) o.clone()
    else {
      require(b.length == o.length && b(0) == o(0) && b(1) == o(1),
        s"cm sketches disagree on (d, w): (${b(0)}, ${b(1)}) vs (${o(0)}, ${o(1)})")
      var i = 2 // counters only — the (d, w) header must not be summed
      while (i < b.length) { b(i) = Math.addExact(b(i), o(i)); i += 1 }
      b
    }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) b
    else addInto(b, BitmapDistinct.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = addInto(b, o)
  override def eval(b: Array[Long]): Any = BitmapDistinct.toBytes(b)
  override def serialize(b: Array[Long]): Array[Byte] = BitmapDistinct.toBytes(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapDistinct.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CountMinMergeAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinMergeAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CountMinMergeAgg = copy(child = c)
}

/** `cm_estimate(sketch, value)` — min-over-rows point estimate for a
  * probe value. Scalar over (probe × sketch) rows, far off the
  * corpus-scan hot path: CodegenFallback.
  */
@ExpressionDescription(
  usage = "cm_estimate(sketch, value) - count-min frequency estimate of value.")
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary sketch, string value), got (${left.dataType.sql}, ${right.dataType.sql})")
  override protected def nullSafeEval(sk: Any, v: Any): Any = {
    val grid = BitmapDistinct.fromBytes(sk.asInstanceOf[Array[Byte]])
    // A cm_merge_agg over zero rows yields an empty byte array; treat
    // it as the zero sketch (estimate 0) so empty rollups behave like
    // the bitmap family's empty-or cardinality-0, not a runtime error.
    if (grid.isEmpty) return 0L
    require(grid.length >= 2, "not a cm_agg sketch")
    val d = grid(0).toInt; val w = grid(1).toInt
    require(grid.length == 2 + d * w, s"corrupt cm sketch: d=$d w=$w len=${grid.length}")
    val s = v.asInstanceOf[UTF8String].toString
    var est = Long.MaxValue
    var i = 0
    while (i < d) {
      est = math.min(est, grid(2 + i * w + CountMin.bucket(s, i, w)))
      i += 1
    }
    est
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
    copy(left = l, right = r)
}

object CountMin {
  val aggName = "cm_agg"
  val mergeName = "cm_merge_agg"
  val estName = "cm_estimate"

  // One digest per thread, reset per call — getInstance per row would
  // dominate the update loop.
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-i bucket of a value: first 8 md5 hex chars of "cm<i>|<value>"
    * mod w — the engine-wide portable hash discipline. DuckDB twin:
    * `CAST(('0x' || substr(md5('cm<i>|' || v), 1, 8)) AS BIGINT) % w`.
    */
  private[functions] def bucket(value: String, row: Int, w: Int): Int = {
    val md = mdPool.get()
    md.reset()
    val dig = md.digest(s"cm$row|$value".getBytes("UTF-8"))
    // First 8 hex chars = first 4 bytes, big-endian unsigned.
    val v = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
      ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
    (v % w).toInt
  }

  /** Column-API entry points; require GraftExtensions on the session. */
  def agg(value: Column, w: Int, d: Int): Column = call_function(aggName, value, lit(w), lit(d))
  def mergeAgg(sketch: Column): Column = call_function(mergeName, sketch)
  def estimate(sketch: Column, value: Column): Column = call_function(estName, sketch, value)
}
