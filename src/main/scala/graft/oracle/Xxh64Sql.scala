package graft.oracle

/** Pure-Scala XXH64 reference (public algorithm: Yann Collet's
  * xxHash, BSD; the same function Spark exposes as `xxhash64` with
  * seed 42). Used ONLY oracle-side: to precompute constant seeds for
  * the generated DuckDB SQL and to lock the SQL emitters against
  * Spark's outputs in specs. Java `Long` arithmetic wraps, which IS
  * mod-2^64 semantics, so the implementation is a direct transcription
  * of the published spec.
  */
object Xxh64Ref {
  val P1 = 0x9E3779B185EBCA87L
  val P2 = 0xC2B2AE3D27D4EB4FL
  val P3 = 0x165667B19E3779F9L
  val P4 = 0x85EBCA77C2B2AE63L
  val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  /** XXH64 of the 4 little-endian bytes of an int (Spark's
    * IntegerType hash path).
    */
  def hashInt(i: Int, seed: Long): Long = {
    var h = seed + P5 + 4L
    h ^= (i & 0xFFFFFFFFL) * P1
    h = rotl(h, 23) * P2 + P3
    fmix(h)
  }

  /** XXH64 of the 8 little-endian bytes of a long (Spark's LongType
    * hash path).
    */
  def hashLong(l: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= rotl(l * P2, 31) * P1
    h = rotl(h, 27) * P1 + P4
    fmix(h)
  }

  private def le8(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFFL); k -= 1 }
    v
  }

  private def le4(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 3
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xFFL); k -= 1 }
    v
  }

  /** XXH64 over a byte array (Spark's StringType path hashes the
    * UTF-8 bytes with this).
    */
  def hashBytes(b: Array[Byte], seed: Long): Long = {
    val n = b.length
    var off = 0
    var h =
      if (n >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
        val limit = n - 32
        while (off <= limit) {
          v1 = rotl(v1 + le8(b, off) * P2, 31) * P1
          v2 = rotl(v2 + le8(b, off + 8) * P2, 31) * P1
          v3 = rotl(v3 + le8(b, off + 16) * P2, 31) * P1
          v4 = rotl(v4 + le8(b, off + 24) * P2, 31) * P1
          off += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = (acc ^ (rotl(v1 * P2, 31) * P1)) * P1 + P4
        acc = (acc ^ (rotl(v2 * P2, 31) * P1)) * P1 + P4
        acc = (acc ^ (rotl(v3 * P2, 31) * P1)) * P1 + P4
        acc = (acc ^ (rotl(v4 * P2, 31) * P1)) * P1 + P4
        acc
      } else seed + P5
    h += n
    while (off + 8 <= n) {
      h = rotl(h ^ (rotl(le8(b, off) * P2, 31) * P1), 27) * P1 + P4
      off += 8
    }
    if (off + 4 <= n) {
      h = rotl(h ^ (le4(b, off) * P1), 23) * P2 + P3
      off += 4
    }
    while (off < n) {
      h = rotl(h ^ ((b(off) & 0xFFL) * P5), 11) * P1
      off += 1
    }
    fmix(h)
  }

  /** Spark's `xxhash64(lit(i), w)`: the int literal folds into the
    * seed chain, then the string's UTF-8 bytes are hashed with that
    * as seed.
    */
  def hashIntThenString(i: Int, s: String, seed: Long = 42L): Long =
    hashBytes(s.getBytes("UTF-8"), hashInt(i, seed))

  /** Spark's `xxhash64(l1, l2, ...)` over long columns: iterated
    * hashLong, seed 42.
    */
  def chainLongs(ls: Seq[Long], seed: Long = 42L): Long =
    ls.foldLeft(seed)((acc, l) => hashLong(l, acc))
}

/** splitmix64-finalized FNV-1a 64 — the [[graft.functions.SimHash64]]
  * word-hash family, transcribed for the oracle side (both are public
  * algorithms: FNV by Fowler–Noll–Vo, splitmix64 by Steele et al.).
  */
object FnvRef {
  val FnvInit = 0xCBF29CE484222325L
  val FnvPrime = 0x100000001B3L
  val C0 = 0x9E3779B97F4A7C15L
  val C1 = 0xBF58476D1CE4E5B9L
  val C2 = 0x94D049BB133111EBL

  def wordHash(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = FnvInit
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFFL; h *= FnvPrime; i += 1 }
    var z = h + C0
    z = (z ^ (z >>> 30)) * C1
    z = (z ^ (z >>> 27)) * C2
    z ^ (z >>> 31)
  }
}

/** DuckDB SQL emitters replaying the engine's production hash
  * families (seeded xxhash64 minhash signatures and band keys; the
  * FNV/splitmix SimHash word hash) exactly, so the xxhash64
  * production queries get the same value-level oracles as their md5
  * twins. DuckDB has no wrapping 64-bit arithmetic, so every
  * operation runs in HUGEINT reduced mod 2^64; deep expression
  * chains are staged through `SELECT *`-carrying CTE layers so no
  * sub-expression is ever textually duplicated more than a couple of
  * times.
  *
  * Deliberately ZERO list/lambda functions: DuckDB 1.0's
  * `list_reduce` cross-contaminates accumulators between rows under
  * batch evaluation when per-row list lengths vary (reproduced with
  * a 5-row VALUES fixture), so unbounded walks (XXH64 32-byte
  * stripes, FNV-1a byte fold) run as RECURSIVE CTE iterations over
  * the word table — callers must open their query with
  * `WITH RECURSIVE` — and the bounded XXH64 tail (at most 3 + 1 + 3
  * steps) is unrolled into staged CASE columns. Bytes are read
  * straight out of `hex(encode(w))` substrings.
  */
object PortableHashSql {
  private val M = "18446744073709551616" // 2^64
  private def u(l: Long): String = java.lang.Long.toUnsignedString(l)
  private def pow2(n: Int): String = BigInt(2).pow(n).toString

  private val uP1 = u(Xxh64Ref.P1); private val uP2 = u(Xxh64Ref.P2)
  private val uP3 = u(Xxh64Ref.P3); private val uP4 = u(Xxh64Ref.P4)
  private val uP5 = u(Xxh64Ref.P5)

  /** (a * b) mod 2^64 for HUGEINT fragments in [0, 2^64): split the
    * left operand at 2^32 so every intermediate stays below 2^96.
    */
  private def mul(a: String, b: String): String =
    s"((((($a) % 4294967296) * ($b)) % $M + (((($a) // 4294967296) * ($b)) % 4294967296) * 4294967296) % $M)"

  private def add(a: String, b: String): String = s"((($a) + ($b)) % $M)"

  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${1L << r}) % $M + (($x) // ${pow2(64 - r)})) % $M)"

  private def xor(a: String, b: String): String = s"xor($a, $b)"

  private def shr(x: String, n: Int): String = s"(($x) // ${pow2(n)})"

  /** Unsigned HUGEINT in [0, 2^64) -> Spark's signed BIGINT. */
  private def signed(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808 THEN ($x) - $M ELSE ($x) END AS BIGINT)"

  /** Signed BIGINT column -> unsigned HUGEINT in [0, 2^64). */
  private def unsigned(col: String): String =
    s"(CASE WHEN $col < 0 THEN CAST($col AS HUGEINT) + $M ELSE CAST($col AS HUGEINT) END)"

  /** Merge-round contribution of a stripe accumulator: rotl31(v*P2)*P1. */
  private def mergeRound(v: String): String = mul(rotl(mul(v, uP2), 31), uP1)

  /** One UTF-8 byte of `w` as HUGEINT, read from the hex column `hx`
    * at the 0-based byte-offset EXPRESSION `off` (+ a constant byte
    * delta), i.e. substr position 2*off + 2*plus + 1.
    */
  private def hb(off: String, plus: Int): String =
    s"CAST(CAST(('0x' || substr(hx, ($off) * 2 + ${2 * plus + 1}, 2)) AS BIGINT) AS HUGEINT)"

  /** Little-endian 8-byte lane at 0-based byte offset `off` + `plus`. */
  private def lane8At(off: String, plus: Int): String =
    (0 until 8).map(j => s"${hb(off, plus + j)} * ${u(1L << (8 * j))}").mkString("(", " + ", ")")

  private def lane4At(off: String, plus: Int): String =
    (0 until 4).map(j => s"${hb(off, plus + j)} * ${1L << (8 * j)}").mkString("(", " + ", ")")

  /** CTE stages `<p>w0..<p>h` mapping a DISTINCT-word source CTE
    * (one column `w`) to `<p>h(w, h0..h{k-1})`: signed-BIGINT XXH64
    * of each word's UTF-8 bytes under each constant seed — the exact
    * values of Spark's `xxhash64(lit(i), w)` when the seeds are
    * `hashInt(i, 42)`. The 32-byte stripes run as a recursive CTE
    * (`<p>sr`); the caller's query must start with `WITH RECURSIVE`.
    */
  def wordHashCtes(prefix: String, srcCte: String, seeds: Seq[Long]): String = {
    val p = prefix
    val idx = seeds.indices
    // Tail geometry (all provable from nb): nw 8-byte lanes, then an
    // optional 4-byte lane iff nb % 8 >= 4, then the nb % 4 trailing
    // bytes starting at nb - nb % 4. At most 3 + 1 + 3 = 7 tail ops.
    val geom =
      s"""${p}w0 AS MATERIALIZED (SELECT w, hex(encode(w)) AS hx, CAST(octet_length(encode(w)) AS BIGINT) AS nb FROM $srcCte),
         |${p}w1 AS MATERIALIZED (SELECT *, (nb % 32) // 8 AS nw, CASE WHEN (nb % 8) >= 4 THEN 1 ELSE 0 END AS h4 FROM ${p}w0),
         |${p}w2 AS MATERIALIZED (SELECT *, nw + h4 + (nb % 4) AS np FROM ${p}w1)""".stripMargin
    // Shared tail lane columns l0..l6 and their seed-independent
    // pre-mixes (m1 = mergeRound for 8-byte steps, m2 = lane*P1 for
    // the 4-byte step, m3 = lane*P5 for byte steps).
    val lanes = (0 until 7).map { k =>
      s"""  CASE WHEN $k < nw THEN ${lane8At("nb - (nb % 32)", 8 * k)}
         |       WHEN h4 = 1 AND $k = nw THEN ${lane4At("nb - (nb % 8)", 0)}
         |       WHEN $k < np THEN ${hb(s"nb - (nb % 4) + ($k - nw - h4)", 0)}
         |       ELSE 0 END AS l$k""".stripMargin
    }
    val mixes = (0 until 7).map { k =>
      s"  ${mergeRound(s"l$k")} AS m1_$k, ${mul(s"l$k", uP1)} AS m2_$k, ${mul(s"l$k", uP5)} AS m3_$k"
    }
    // Stripe recursion: 4 accumulators per seed, one iteration per
    // 32-byte stripe; words with nb < 32 terminate at the base row.
    val init = idx.map { i =>
      val s = seeds(i)
      s"  CAST(${u(s + Xxh64Ref.P1 + Xxh64Ref.P2)} AS HUGEINT) AS a$i, CAST(${u(s + Xxh64Ref.P2)} AS HUGEINT) AS b$i, CAST(${u(s)} AS HUGEINT) AS c$i, CAST(${u(s - Xxh64Ref.P1)} AS HUGEINT) AS d$i"
    }
    def rnd(acc: String, pl: String): String = mul(rotl(add(acc, pl), 31), uP1)
    val iter = idx.map(i =>
      s"  ${rnd(s"a$i", "pa")} AS a$i, ${rnd(s"b$i", "pb")} AS b$i, ${rnd(s"c$i", "pc")} AS c$i, ${rnd(s"d$i", "pd")} AS d$i")
    val stripes =
      s"""${p}sr AS (
         |  SELECT w, hx, nb, CAST(0 AS BIGINT) AS s,
         |${init.mkString(",\n")}
         |  FROM ${p}w0
         |  UNION ALL
         |  SELECT w, hx, nb, s + 1,
         |${iter.mkString(",\n")}
         |  FROM (SELECT *, ${mul(lane8At("s * 32", 0), uP2)} AS pa, ${mul(lane8At("s * 32", 8), uP2)} AS pb,
         |               ${mul(lane8At("s * 32", 16), uP2)} AS pc, ${mul(lane8At("s * 32", 24), uP2)} AS pd
         |        FROM ${p}sr WHERE s < nb // 32) z),
         |${p}sf AS MATERIALIZED (SELECT * FROM ${p}sr WHERE s = nb // 32)""".stripMargin
    // Merge: stage the four rotl31(v*P2)*P1 contributions as columns,
    // then fold them in four cheap stages.
    val mr = idx.map(i =>
      s"  ${mergeRound(s"a$i")} AS ra$i, ${mergeRound(s"b$i")} AS rb$i, ${mergeRound(s"c$i")} AS rc$i, ${mergeRound(s"d$i")} AS rd$i," +
        s" ${add(add(add(rotl(s"a$i", 1), rotl(s"b$i", 7)), rotl(s"c$i", 12)), rotl(s"d$i", 18))} AS m0_$i")
    def mg(acc: String, mrCol: String): String = add(mul(xor(acc, mrCol), uP1), uP4)
    val stages = scala.collection.mutable.ArrayBuffer[String](geom, stripes)
    stages += s"${p}s0 AS MATERIALIZED (SELECT *,\n" + mr.mkString(",\n") + s"\n  FROM ${p}sf)"
    stages += s"${p}s1 AS MATERIALIZED (SELECT *,\n" + idx.map(i => s"  ${mg(s"m0_$i", s"ra$i")} AS g1_$i").mkString(",\n") + s"\n  FROM ${p}s0)"
    stages += s"${p}s2 AS MATERIALIZED (SELECT *,\n" + idx.map(i => s"  ${mg(s"g1_$i", s"rb$i")} AS g2_$i").mkString(",\n") + s"\n  FROM ${p}s1)"
    stages += s"${p}s3 AS MATERIALIZED (SELECT *,\n" + idx.map(i => s"  ${mg(s"g2_$i", s"rc$i")} AS g3_$i").mkString(",\n") + s"\n  FROM ${p}s2)"
    stages += s"${p}s4 AS MATERIALIZED (SELECT *,\n" + idx.map(i => s"  ${mg(s"g3_$i", s"rd$i")} AS g4_$i").mkString(",\n") + s"\n  FROM ${p}s3)"
    // Join tail geometry back in, then the seed-length base value.
    stages += s"${p}s5 AS MATERIALIZED (SELECT g.*, t.nw, t.h4, t.np FROM ${p}s4 g JOIN ${p}w2 t USING (w))"
    stages += s"${p}s6 AS MATERIALIZED (SELECT *,\n" + lanes.mkString(",\n") + s"\n  FROM ${p}s5)"
    stages += s"${p}s7 AS MATERIALIZED (SELECT *,\n" + mixes.mkString(",\n") + s"\n  FROM ${p}s6)"
    stages += s"${p}s8 AS MATERIALIZED (SELECT *,\n" + idx.map(i =>
      s"  ${add(s"CASE WHEN nb < 32 THEN CAST(${u(seeds(i) + Xxh64Ref.P5)} AS HUGEINT) ELSE g4_$i END", "CAST(nb AS HUGEINT)")} AS t0_$i").mkString(",\n") + s"\n  FROM ${p}s7)"
    // Unrolled tail: step k applies the op-k kind (or passes through).
    for (k <- 0 until 7) {
      val step = idx.map { i =>
        val acc = s"t${k}_$i"
        s"""  CASE WHEN $k < nw THEN ${add(mul(rotl(xor(acc, s"m1_$k"), 27), uP1), uP4)}
           |       WHEN h4 = 1 AND $k = nw THEN ${add(mul(rotl(xor(acc, s"m2_$k"), 23), uP2), uP3)}
           |       WHEN $k < np THEN ${mul(rotl(xor(acc, s"m3_$k"), 11), uP1)}
           |       ELSE $acc END AS t${k + 1}_$i""".stripMargin
      }
      stages += s"${p}t$k AS MATERIALIZED (SELECT *,\n" + step.mkString(",\n") + s"\n  FROM ${if (k == 0) s"${p}s8" else s"${p}t${k - 1}"})"
    }
    stages += s"${p}v0 AS MATERIALIZED (SELECT *,\n" + idx.map(i => s"  ${mul(xor(s"t7_$i", shr(s"t7_$i", 33)), uP2)} AS u$i").mkString(",\n") + s"\n  FROM ${p}t6)"
    stages += s"${p}v1 AS MATERIALIZED (SELECT *,\n" + idx.map(i => s"  ${mul(xor(s"u$i", shr(s"u$i", 29)), uP3)} AS v$i").mkString(",\n") + s"\n  FROM ${p}v0)"
    stages += s"${p}h AS MATERIALIZED (SELECT w,\n" + idx.map(i => s"  ${signed(xor(s"v$i", shr(s"v$i", 32)))} AS h$i").mkString(",\n") + s"\n  FROM ${p}v1)"
    stages.mkString(",\n")
  }

  /** CTE stages mapping `srcCte` (carrying signed BIGINT columns
    * `cols` plus whatever else) to `<p>k` = srcCte's columns plus
    * `keyName` = `CAST(xxhash64(cols...) AS VARCHAR)` — Spark's
    * LongType seed-chain band key. One hashLong per column, staged.
    * NULL parity with Spark's HashExpression: a NULL input SKIPS its
    * fold step (the seed passes through unchanged) — naive arithmetic
    * would instead poison the whole chain to NULL and report spurious
    * mismatches for any nullable column.
    */
  def chainLongsCtes(prefix: String, srcCte: String, colGroups: Seq[(String, Seq[String])]): String = {
    val p = prefix
    var from = srcCte
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    val levels = colGroups.head._2.length
    require(colGroups.forall(_._2.length == levels), "all band key chains must have equal length")
    // sd{g}_{k}: the unsigned seed after folding k longs of group g.
    for (k <- 0 until levels) {
      val mv = colGroups.indices.map { g =>
        s"  ${mergeRound(unsigned(colGroups(g)._2(k)))} AS mv${g}_$k"
      }
      ctes += s"${p}m$k AS MATERIALIZED (SELECT *,\n${mv.mkString(",\n")}\n  FROM $from)"
      val y = colGroups.indices.map { g =>
        val seed = if (k == 0) "CAST(42 AS HUGEINT)" else s"sd${g}_$k"
        val pre = add(add(seed, uP5), "8")
        s"  ${add(mul(rotl(xor(pre, s"mv${g}_$k"), 27), uP1), uP4)} AS y${g}_$k"
      }
      ctes += s"${p}y$k AS MATERIALIZED (SELECT *,\n${y.mkString(",\n")}\n  FROM ${p}m$k)"
      val a = colGroups.indices.map(g => s"  ${mul(xor(s"y${g}_$k", shr(s"y${g}_$k", 33)), uP2)} AS a${g}_$k")
      ctes += s"${p}a$k AS MATERIALIZED (SELECT *,\n${a.mkString(",\n")}\n  FROM ${p}y$k)"
      val b = colGroups.indices.map(g => s"  ${mul(xor(s"a${g}_$k", shr(s"a${g}_$k", 29)), uP3)} AS b${g}_$k")
      ctes += s"${p}b$k AS MATERIALIZED (SELECT *,\n${b.mkString(",\n")}\n  FROM ${p}a$k)"
      val c = colGroups.indices.map { g =>
        val seed = if (k == 0) "CAST(42 AS HUGEINT)" else s"sd${g}_$k"
        s"  CASE WHEN ${colGroups(g)._2(k)} IS NULL THEN $seed" +
          s" ELSE ${xor(s"b${g}_$k", shr(s"b${g}_$k", 32))} END AS sd${g}_${k + 1}"
      }
      ctes += s"${p}c$k AS MATERIALIZED (SELECT *,\n${c.mkString(",\n")}\n  FROM ${p}b$k)"
      from = s"${p}c$k"
    }
    val fin = colGroups.indices.map { g =>
      s"  CAST(${signed(s"sd${g}_$levels")} AS VARCHAR) AS ${colGroups(g)._1}"
    }
    ctes += s"${p}k AS MATERIALIZED (SELECT *,\n${fin.mkString(",\n")}\n  FROM $from)"
    ctes.mkString(",\n")
  }

  /** CTE stages mapping a DISTINCT-word source (column `w`) to
    * `<p>h(w, hv)`: the FNV-1a-64 + splitmix64 word hash of
    * [[graft.functions.SimHash64]], as unsigned HUGEINT (bit votes
    * read it with `// 2^b % 2`). The byte fold is a recursive CTE —
    * the caller's query must start with `WITH RECURSIVE`.
    */
  def fnvWordHashCtes(prefix: String, srcCte: String): String = {
    val p = prefix
    val z0 = add("fr", u(FnvRef.C0))
    Seq(
      s"${p}p0 AS MATERIALIZED (SELECT w, hex(encode(w)) AS hx, CAST(octet_length(encode(w)) AS BIGINT) AS nb FROM $srcCte)",
      s"""${p}fr AS (
         |  SELECT w, hx, nb, CAST(0 AS BIGINT) AS i, CAST(${u(FnvRef.FnvInit)} AS HUGEINT) AS ac FROM ${p}p0
         |  UNION ALL
         |  SELECT w, hx, nb, i + 1, ${mul(xor("ac", hb("i", 0)), u(FnvRef.FnvPrime))}
         |  FROM ${p}fr WHERE i < nb)""".stripMargin,
      s"${p}p1 AS MATERIALIZED (SELECT w, ac AS fr FROM ${p}fr WHERE i = nb)",
      s"${p}p2 AS MATERIALIZED (SELECT *, ${mul(xor(z0, shr(z0, 30)), u(FnvRef.C1))} AS z1 FROM ${p}p1)",
      s"${p}p3 AS MATERIALIZED (SELECT *, ${mul(xor("z1", shr("z1", 27)), u(FnvRef.C2))} AS z2 FROM ${p}p2)",
      s"${p}h AS MATERIALIZED (SELECT w, ${xor("z2", shr("z2", 31))} AS hv FROM ${p}p3)"
    ).mkString(",\n")
  }
}
