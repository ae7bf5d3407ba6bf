package graft.datapipe

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the SymSpell claim `editDistanceJoin` rests on:
  * strings within Levenshtein distance k share a depth-k deletion
  * variant (candidate COMPLETENESS — a false dismissal here would be
  * a silently wrong join; false candidates are harmless, the exact
  * verify kills them). Pure JVM reference mirrors of the Column
  * expressions; FuzzyJoinSpec bridges the expressions to these.
  */
object FuzzyJoinProps extends Properties("FuzzyJoin") {

  /** Reference depth-k deletion neighborhood (includes the string). */
  def neighborhood(s: String, k: Int): Set[String] = {
    def delOne(v: String): Set[String] =
      (0 until v.length).map(i => v.substring(0, i) + v.substring(i + 1)).toSet
    var acc = Set(s)
    var frontier = Set(s)
    (1 to k).foreach { _ =>
      frontier = frontier.flatMap(delOne)
      acc ++= frontier
    }
    acc
  }

  def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // Small alphabet + short strings make close pairs common, so the
  // implication's antecedent actually fires.
  private val word = Gen.chooseNum(0, 8).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  property("completeness: lev(a,b) <= k implies a shared depth-k deletion variant") =
    Prop.forAll(word, word, Gen.oneOf(1, 2)) { (a, b, k) =>
      lev(a, b) > k || neighborhood(a, k).intersect(neighborhood(b, k)).nonEmpty
    }

  property("a shared variant bounds the distance: intersect at depth k implies lev <= 2k") =
    Prop.forAll(word, word, Gen.oneOf(1, 2)) { (a, b, k) =>
      neighborhood(a, k).intersect(neighborhood(b, k)).isEmpty || lev(a, b) <= 2 * k
    }

  property("neighborhood size is bounded by the closed form") =
    Prop.forAll(word, Gen.oneOf(1, 2)) { (a, k) =>
      val bound =
        if (k == 1) 1 + a.length
        else 1 + a.length + a.length * math.max(a.length - 1, 0) / 2
      neighborhood(a, k).size <= bound
    }
}
