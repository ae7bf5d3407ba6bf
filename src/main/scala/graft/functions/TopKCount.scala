package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `topk_count(term, k, capacity)` — heavy-hitters aggregate: the top-k
  * most frequent terms per group, computed in BOUNDED memory via the
  * SpaceSaving sketch (Metwally et al. 2005, "Efficient computation of
  * frequent and top-k elements in data streams"; merge rule from
  * Agarwal et al. 2012, "Mergeable summaries").
  *
  * Why not `groupBy(term).count().orderBy(...).limit(k)`: that shuffles
  * the FULL term-frequency table — at corpus scale the distinct-term
  * set (URLs, n-grams, tokens) is itself huge, and the two-level
  * aggregation materializes all of it to answer a top-10 question. This
  * aggregate holds at most `capacity` counters per buffer; partial
  * (map-side) aggregation applies — executors stream their partitions
  * into local sketches and only `capacity`-sized summaries shuffle.
  *
  * Guarantees (N = group occurrence count): every term with true
  * frequency > N/capacity is in the summary; for each reported entry,
  * true <= cnt <= true + err. When `capacity` is never exceeded — per
  * partial buffer or at merge — counts are EXACT and err = 0 (the
  * regime the DuckDB oracle checks); the property suite drives the
  * saturated regime.
  *
  * Output: array<struct<term, cnt, err>> ordered by (cnt DESC, term
  * ASC) — deterministic for identical counts regardless of input order.
  */
@ExpressionDescription(
  usage = "topk_count(term, k, capacity) - top-k frequent terms via a bounded SpaceSaving sketch.")
case class TopKCount(
    first: Expression,   // term (string)
    second: Expression,  // k (int literal)
    third: Expression,   // capacity (int literal)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKCount.Summary] with TernaryLike[Expression] {

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val capacity: Int = third.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string term, got ${first.dataType.sql}")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects literal k and capacity")
    else if (second.dataType != IntegerType || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects int k and capacity")
    else
      (FoldableLiteral.int(prettyName, "k", second),
        FoldableLiteral.int(prettyName, "capacity", third)) match {
        case (Left(f), _) => f
        case (_, Left(f)) => f
        case (Right(kv), Right(cap)) =>
          if (kv < 1 || cap < kv)
            TypeCheckResult.TypeCheckFailure(s"$prettyName needs 1 <= k <= capacity, got k=$kv capacity=$cap")
          else TypeCheckResult.TypeCheckSuccess
      }

  override def dataType: DataType = TopKCount.resultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKCount.Summary = new TopKCount.Summary(capacity)

  override def update(b: TopKCount.Summary, input: InternalRow): TopKCount.Summary = {
    val v = first.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: TopKCount.Summary, o: TopKCount.Summary): TopKCount.Summary = b.mergeWith(o)

  override def eval(b: TopKCount.Summary): Any = b.topK(k)

  override def serialize(b: TopKCount.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): TopKCount.Summary = TopKCount.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): TopKCount = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKCount = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): TopKCount =
    copy(first = f, second = s, third = t)
}

/** `topk_sum(term, weight, k, capacity)` — the weighted SpaceSaving
  * variant: top-k terms by SUMMED non-negative long weight instead of
  * occurrence count (top domains by token volume, top users by bytes).
  * Same summary, same guarantees with N = total weight; same exact
  * regime when capacity is never exceeded.
  */
@ExpressionDescription(
  usage = "topk_sum(term, weight, k, capacity) - top-k terms by summed weight via a bounded SpaceSaving sketch.")
case class TopKSum(
    term: Expression,
    weight: Expression,
    kExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKCount.Summary] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val capacity: Int = capExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(term, weight, kExpr, capExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (term.dataType != StringType || weight.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, bigint), got (${term.dataType.sql}, ${weight.dataType.sql})")
    else if (!kExpr.foldable || !capExpr.foldable ||
      kExpr.dataType != IntegerType || capExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects literal int k and capacity")
    else
      (FoldableLiteral.int(prettyName, "k", kExpr),
        FoldableLiteral.int(prettyName, "capacity", capExpr)) match {
        case (Left(f), _) => f
        case (_, Left(f)) => f
        case (Right(kv), Right(cap)) =>
          if (kv < 1 || cap < kv)
            TypeCheckResult.TypeCheckFailure(s"$prettyName needs 1 <= k <= capacity, got k=$kv capacity=$cap")
          else TypeCheckResult.TypeCheckSuccess
      }

  override def dataType: DataType = TopKCount.resultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKCount.Summary = new TopKCount.Summary(capacity)

  override def update(b: TopKCount.Summary, input: InternalRow): TopKCount.Summary = {
    val t = term.eval(input)
    val w = weight.eval(input)
    if (t != null && w != null) {
      val wl = w.asInstanceOf[Long]
      require(wl >= 0, s"$prettyName weight must be non-negative, got $wl")
      if (wl > 0) b.add(t.asInstanceOf[UTF8String], wl)
    }
    b
  }

  override def merge(b: TopKCount.Summary, o: TopKCount.Summary): TopKCount.Summary = b.mergeWith(o)
  override def eval(b: TopKCount.Summary): Any = b.topK(k)
  override def serialize(b: TopKCount.Summary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): TopKCount.Summary = TopKCount.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): TopKSum = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKSum = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKSum =
    copy(term = c(0), weight = c(1), kExpr = c(2), capExpr = c(3))
}

object TopKSum {
  val fnName = "topk_sum"

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(term: Column, weight: Column, k: Int, capacity: Int): Column =
    call_function(fnName, term, weight, lit(k), lit(capacity))
}

object TopKCount {
  val fnName = "topk_count"

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(term: Column, k: Int, capacity: Int): Column =
    call_function(fnName, term, lit(k), lit(capacity))

  /** SpaceSaving summary: at most `capacity` (term -> [count, err])
    * counters. `saturated` records whether any eviction/trim has
    * happened — while false, counts are exact and absent terms have
    * true frequency 0.
    */
  final class Summary(val capacity: Int) {
    private[TopKCount] val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    private[TopKCount] var saturated = false

    /** Smallest counter value (the eviction bound). O(capacity) — only
      * called on eviction and merge of saturated summaries.
      */
    private def minCount: Long = {
      var m = Long.MaxValue
      val it = counts.values().iterator()
      while (it.hasNext) m = math.min(m, it.next()(0))
      if (m == Long.MaxValue) 0L else m
    }

    def add(term: UTF8String): Unit = add(term, 1L, 0L)

    /** Weighted increment (the topk_sum path). */
    def add(term: UTF8String, by: Long): Unit = add(term, by, 0L)

    private def add(term: UTF8String, by: Long, err: Long): Unit = {
      val e = counts.get(term)
      // addExact: the weighted path (topk_sum) takes caller-supplied
      // weights — a silent Long wrap would corrupt ranks undetectably.
      if (e != null) { e(0) = Math.addExact(e(0), by); e(1) = Math.addExact(e(1), err) }
      else if (counts.size < capacity)
        // Input UTF8Strings may point into a reused row buffer — copy.
        counts.put(term.clone(), Array(by, err))
      else {
        // Evict the min-count entry (ties: lexicographically greatest
        // term goes, so the surviving set is order-independent). The
        // newcomer inherits the evicted count as its overestimate.
        saturated = true
        var victim: UTF8String = null
        var vc = Long.MaxValue
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          val c = en.getValue()(0)
          // victim == null guards the first entry: at c == Long.MaxValue
          // the `c < vc` test is false and compareTo(null) would NPE.
          if (victim == null || c < vc || (c == vc && en.getKey.compareTo(victim) > 0)) {
            victim = en.getKey; vc = c
          }
        }
        counts.remove(victim)
        counts.put(term.clone(), Array(Math.addExact(vc, by), Math.addExact(vc, err)))
      }
    }

    /** Mergeable-summaries rule: absent terms count as the other side's
      * eviction bound (0 while it never evicted), then trim back to
      * capacity keeping the largest counters.
      */
    def mergeWith(o: Summary): Summary = {
      val selfFloor = if (saturated) minCount else 0L
      val otherFloor = if (o.saturated) o.minCount else 0L
      saturated = saturated || o.saturated
      // Terms in both / only in other.
      val oit = o.counts.entrySet().iterator()
      while (oit.hasNext) {
        val en = oit.next()
        val mine = counts.get(en.getKey)
        if (mine != null) {
          mine(0) = Math.addExact(mine(0), en.getValue()(0))
          mine(1) = Math.addExact(mine(1), en.getValue()(1))
        }
        else counts.put(en.getKey,
          Array(Math.addExact(en.getValue()(0), selfFloor), Math.addExact(en.getValue()(1), selfFloor)))
      }
      // Terms only in self: the other side may have seen-and-evicted.
      if (otherFloor > 0) {
        val sit = counts.entrySet().iterator()
        while (sit.hasNext) {
          val en = sit.next()
          if (!o.counts.containsKey(en.getKey)) {
            en.getValue()(0) = Math.addExact(en.getValue()(0), otherFloor)
            en.getValue()(1) = Math.addExact(en.getValue()(1), otherFloor)
          }
        }
      }
      if (counts.size > capacity) {
        saturated = true
        val order = sortedEntries
        var i = capacity
        while (i < order.length) { counts.remove(order(i)._1); i += 1 }
      }
      this
    }

    /** Entries by (cnt DESC, term ASC) — the deterministic output order. */
    private def sortedEntries: Array[(UTF8String, Array[Long])] = {
      val arr = new Array[(UTF8String, Array[Long])](counts.size)
      var i = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
      arr.sortInPlaceWith { case ((ta, ca), (tb, cb)) =>
        if (ca(0) != cb(0)) ca(0) > cb(0) else ta.compareTo(tb) < 0
      }
      arr
    }

    def topK(k: Int): GenericArrayData = {
      val top = sortedEntries.take(k)
      new GenericArrayData(top.map { case (t, c) =>
        InternalRow(t, c(0), c(1))
      }.asInstanceOf[Array[Any]])
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(capacity)
      out.writeBoolean(saturated)
      out.writeInt(counts.size)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val b = e.getKey.getBytes
        out.writeInt(b.length); out.write(b)
        out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte]): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val s = new Summary(in.readInt())
      s.saturated = in.readBoolean()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b)
        s.counts.put(UTF8String.fromBytes(b), Array(in.readLong(), in.readLong()))
        i += 1
      }
      s
    }
  }
}
