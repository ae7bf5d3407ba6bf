package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.functions.{call_function, concat, conv, lit, md5, substring}
import org.apache.spark.sql.types._

/** Fixed-size distinct-bucket bitmaps — the mergeable distinct sketch
  * (Whang et al. 1990, "A linear-time probabilistic counting algorithm
  * for database applications"; the bitmap-OR merge discipline of the
  * DataSketches/theta family).
  *
  * `bitmap_agg(bucket, m)` folds a group's bucket ids into an m-bit
  * bitmap; `bitmap_cardinality` / `bitmap_and_cardinality` /
  * `bitmap_or_cardinality` do exact set algebra over the sketches.
  *
  * Why not `countDistinct`: exact distinct shuffles every distinct
  * VALUE — at corpus scale the distinct set (users, URLs, tokens) is
  * itself huge, and cross-segment overlap questions (distinct users in
  * BOTH segments) need a second full shuffle per pair. The bitmap is a
  * fixed m/8-byte buffer per group: partial aggregation applies
  * (executors fold their partitions locally, only bitmaps shuffle),
  * merge is a word-wise OR, and every segment-algebra question —
  * union, intersection, overlap matrices across N segments — is a
  * driver-cheap bitwise op over the already-built sketch table, no
  * re-scan of the raw data.
  *
  * The observable is the exact DISTINCT-BUCKET count K (collisions
  * under-count like any fixed-width sketch; the linear-counting
  * estimate −m·ln(1−K/m) is a caller-side refinement). Buckets come
  * from the engine's portable hash discipline (md5 hex prefix mod m —
  * [[BitmapDistinct.bucketOf]]), so a DuckDB oracle recomputes every
  * bitmap, cardinality, and intersection value-exactly in SQL.
  */
@ExpressionDescription(
  usage = "bitmap_agg(bucket, m) - m-bit distinct-bucket bitmap of the group's bucket ids.")
case class BitmapAgg(
    left: Expression,   // bucket id (long, in [0, m))
    right: Expression,  // m (int literal, multiple of 64)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private lazy val m: Int = right.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a bigint bucket, got ${left.dataType.sql}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a literal int m")
    else
      FoldableLiteral.int(prettyName, "m", right) match {
        case Left(f) => f
        case Right(mv) =>
          if (mv < 64 || mv % 64 != 0 || mv > (1 << 26))
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName needs m in [64, 2^26] and a multiple of 64, got $mv")
          else TypeCheckResult.TypeCheckSuccess
      }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    if (v != null) {
      val bkt = v.asInstanceOf[Long]
      require(bkt >= 0 && bkt < m, s"bucket $bkt outside [0, $m) — hash mod m upstream")
      b((bkt >> 6).toInt) |= 1L << (bkt & 63)
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = BitmapDistinct.toBytes(b)
  override def serialize(b: Array[Long]): Array[Byte] = BitmapDistinct.toBytes(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapDistinct.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): BitmapAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAgg =
    copy(left = l, right = r)
}

/** `bitmap_or_agg(bm)` — OR-merge of PRE-BUILT bitmap sketches: the
  * rollup aggregate that turns a stored sketch table (per day, per
  * segment) into coarser cardinalities without touching raw data —
  * the whole point of persisting sketches. m is inferred from the
  * first sketch seen; mismatched widths fail loudly.
  */
@ExpressionDescription(
  usage = "bitmap_or_agg(bm) - bitwise OR of bitmap_agg sketches.")
case class BitmapOrAgg(
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

  private def orInto(b: Array[Long], o: Array[Long]): Array[Long] =
    if (o.isEmpty) b
    else if (b.isEmpty) o.clone()
    else {
      require(b.length == o.length,
        s"sketches disagree on m: ${b.length * 64} vs ${o.length * 64} bits")
      var i = 0
      while (i < b.length) { b(i) |= o(i); i += 1 }
      b
    }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) b
    else orInto(b, BitmapDistinct.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = orInto(b, o)
  override def eval(b: Array[Long]): Any = BitmapDistinct.toBytes(b)
  override def serialize(b: Array[Long]): Array[Byte] = BitmapDistinct.toBytes(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapDistinct.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): BitmapOrAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapOrAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BitmapOrAgg = copy(child = c)
}

/** `bitmap_cardinality(bm)` — number of set bits. Scalar over sketch
  * rows (one per group), not corpus rows: CodegenFallback is fine off
  * the hot path.
  */
@ExpressionDescription(
  usage = "bitmap_cardinality(bm) - set-bit count of a bitmap_agg sketch.")
case class BitmapCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got ${child.dataType.sql}")
  override protected def nullSafeEval(v: Any): Any =
    BitmapDistinct.fromBytes(v.asInstanceOf[Array[Byte]]).map(java.lang.Long.bitCount(_).toLong).sum
  override protected def withNewChildInternal(c: Expression): BitmapCardinality = copy(child = c)
}

/** `bitmap_and_cardinality(a, b)` / `bitmap_or_cardinality(a, b)` —
  * exact intersection / union cardinality of two equal-m sketches.
  */
@ExpressionDescription(
  usage = "bitmap_and_cardinality(a, b) - set-bit count of the bitwise AND of two sketches.")
case class BitmapAndCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary, binary)")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapDistinct.combineCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], and = true)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndCardinality =
    copy(left = l, right = r)
}

@ExpressionDescription(
  usage = "bitmap_or_cardinality(a, b) - set-bit count of the bitwise OR of two sketches.")
case class BitmapOrCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (binary, binary)")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapDistinct.combineCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], and = false)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapOrCardinality =
    copy(left = l, right = r)
}

object BitmapDistinct {
  val aggName = "bitmap_agg"
  val orAggName = "bitmap_or_agg"
  val cardName = "bitmap_cardinality"
  val andName = "bitmap_and_cardinality"
  val orName = "bitmap_or_cardinality"

  /** Portable bucket id of a value: first 8 md5 hex chars (the
    * engine-wide hash discipline, cf. Sampling.hashHex) parsed as a
    * long, mod m. NULL-preserving: a NULL value yields a NULL bucket
    * (concat null-propagates), matching the DuckDB twin
    * `CAST(('0x' || substr(md5('<salt>|' || CAST(v AS VARCHAR)), 1, 8)) AS BIGINT) % m`
    * where `'bm|' || NULL` is NULL — not a phantom bucket for the
    * literal salt alone.
    */
  def bucketOf(value: Column, m: Int, salt: String = "bm"): Column =
    conv(substring(md5(concat(lit(salt + "|"), value.cast("string"))), 1, 8), 16, 10)
      .cast("long") % m

  /** Column-API entry points; require GraftExtensions on the session. */
  def agg(bucket: Column, m: Int): Column = call_function(aggName, bucket, lit(m))
  def orAgg(bm: Column): Column = call_function(orAggName, bm)
  def cardinality(bm: Column): Column = call_function(cardName, bm)
  def andCardinality(a: Column, b: Column): Column = call_function(andName, a, b)
  def orCardinality(a: Column, b: Column): Column = call_function(orName, a, b)

  /** Linear-counting estimate −m·ln(1−K/m) from an exact bucket count
    * (caller-side refinement — deliberately NOT part of any oracle
    * output: ln is IEEE-implementation-dependent across engines).
    */
  def linearCountEstimate(k: Column, m: Int): Column = {
    import org.apache.spark.sql.functions.{log => ln}
    -lit(m.toDouble) * ln(lit(1.0) - k.cast("double") / lit(m.toDouble))
  }

  private[functions] def toBytes(words: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(buf.putLong)
    buf.array()
  }

  private[functions] def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, s"bitmap sketch must be 8-byte aligned, got ${bytes.length}")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(buf.getLong)
  }

  private[functions] def combineCount(a: Array[Byte], b: Array[Byte], and: Boolean): Long = {
    require(a.length == b.length,
      s"sketches disagree on m: ${a.length * 8} vs ${b.length * 8} bits")
    val wa = fromBytes(a); val wb = fromBytes(b)
    var i = 0; var n = 0L
    while (i < wa.length) {
      n += java.lang.Long.bitCount(if (and) wa(i) & wb(i) else wa(i) | wb(i))
      i += 1
    }
    n
  }
}
