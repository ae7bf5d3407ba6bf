package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the fused cosine kernel (pure JVM, no Spark
  * session needed — the same static method the generated code calls).
  */
object CosineSimilarityProps extends Properties("CosineSimilarity") {

  private val finiteD = Gen.chooseNum(-1e6, 1e6)
  private val vec = Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, finiteD)).map(_.toArray)

  private def cos(a: Array[Double], b: Array[Double]) =
    CosineSimilarity.cosine(new GenericArrayData(a), new GenericArrayData(b))

  property("self-similarity of a nonzero vector is 1 (to fp rounding)") =
    Prop.forAll(vec) { a =>
      a.forall(_ == 0.0) || {
        val c = cos(a, a)
        c != null && math.abs(c - 1.0) < 1e-9
      }
    }

  property("symmetric (bitwise, NaN-safe)") = Prop.forAll(vec, vec) { (a, b) =>
    (a.length != b.length) || {
      val (x, y) = (cos(a, b), cos(b, a))
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    }
  }

  property("bounded in [-1, 1] (to fp rounding) for nonzero vectors") =
    Prop.forAll(vec, vec) { (a, b) =>
      a.length != b.length || a.forall(_ == 0.0) || b.forall(_ == 0.0) || {
        val c = cos(a, b)
        c != null && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
      }
    }

  property("scale-invariant under positive scaling") =
    Prop.forAll(vec, vec, Gen.chooseNum(0.5, 100.0)) { (a, b, s) =>
      a.length != b.length || a.forall(_ == 0.0) || b.forall(_ == 0.0) || {
        val c1 = cos(a, b)
        val c2 = cos(a.map(_ * s), b)
        c1 != null && c2 != null && math.abs(c1 - c2) < 1e-6
      }
    }

  property("length mismatch is null") = Prop.forAll(vec) { a =>
    cos(a, a ++ Array(1.0)) == null
  }
}
