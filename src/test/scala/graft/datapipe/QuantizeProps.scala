package graft.datapipe

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the int8 quantization MATH (pure JVM mirror of
  * the Column expressions — same fixed-order IEEE ops, so a property
  * holding here holds for the generated code too).
  */
object QuantizeProps extends Properties("Quantize") {

  private val finiteF = Gen.chooseNum(-1e4f, 1e4f)
  private val vec = Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, finiteF)).map(_.toArray)

  /** Scala mirror of Quantize.codes / dequantize for one component. */
  private def code(x: Float, mn: Double, mx: Double): Int =
    if (mx == mn) 0
    else math.min(255L, math.floor((x.toDouble - mn) * 255.0 / (mx - mn)).toLong).toInt

  private def dequant(c: Int, mn: Double, mx: Double): Double =
    if (mx == mn) mn
    else if (c == 255) mx // code 255 is exactly x = mx, not a cell
    else mn + (c.toDouble + 0.5) * (mx - mn) / 255.0

  property("codes stay in [0, 255]") = Prop.forAll(vec) { v =>
    val (mn, mx) = (v.min.toDouble, v.max.toDouble)
    v.forall { x => val c = code(x, mn, mx); c >= 0 && c <= 255 }
  }

  property("roundtrip error bounded by one quantization cell") =
    Prop.forAll(vec) { v =>
      val (mn, mx) = (v.min.toDouble, v.max.toDouble)
      val cell = (mx - mn) / 255.0
      v.forall { x =>
        math.abs(dequant(code(x, mn, mx), mn, mx) - x.toDouble) <= math.max(cell, 1e-12)
      }
    }

  property("reconstruction never leaves the stored [qmin, qmax] bounds") =
    Prop.forAll(vec) { v =>
      val (mn, mx) = (v.min.toDouble, v.max.toDouble)
      v.forall { x =>
        val d = dequant(code(x, mn, mx), mn, mx)
        d >= mn && d <= mx
      }
    }

  property("max component error is at most HALF a cell (code 255 = qmax exactly)") =
    Prop.forAll(vec) { v =>
      val (mn, mx) = (v.min.toDouble, v.max.toDouble)
      // x = mx usually codes 255 (exact reconstruction); adverse IEEE
      // rounding can floor it to 254 (center reconstruction, half-cell
      // error). Either way the old center-of-cell decode of 255 — a
      // half cell ABOVE mx — is ruled out.
      val halfCell = (mx - mn) / 510.0
      math.abs(dequant(code(v.max, mn, mx), mn, mx) - mx) <= math.max(halfCell, 1e-12)
    }

  property("codes are monotone in the component value") = Prop.forAll(vec) { v =>
    val (mn, mx) = (v.min.toDouble, v.max.toDouble)
    val sorted = v.sorted
    sorted.zip(sorted.tail).forall { case (a, b) => code(a, mn, mx) <= code(b, mn, mx) }
  }

  property("constant vectors collapse to zero codes and exact reconstruction") =
    Prop.forAll(finiteF, Gen.chooseNum(1, 32)) { (x, n) =>
      val mn = x.toDouble
      (0 until n).forall(_ => code(x, mn, mn) == 0 && dequant(0, mn, mn) == mn)
    }
}
