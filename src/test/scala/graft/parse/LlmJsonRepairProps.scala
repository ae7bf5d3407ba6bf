package graft.parse

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties: the repair ladder is total (never throws),
  * idempotent on its own output, and the validators obey their
  * algebra on arbitrary inputs.
  */
object LlmJsonRepairProps extends Properties("LlmJsonRepair") {

  property("extract is total on arbitrary strings") = Prop.forAll { (s: String) =>
    LlmJsonRepair.extract(s) != null
  }

  property("repair is total on arbitrary strings with arbitrary field") =
    Prop.forAll(Gen.asciiPrintableStr, Gen.alphaStr) { (s, f) =>
      LlmJsonRepair.repair(s, f) != null
    }

  private val keyGen = Gen.nonEmptyListOf(Gen.choose(1L, 999999L)).map(_.distinct)

  property("well-formed objects round-trip through extract") =
    Prop.forAll(keyGen) { keys =>
      val json = keys.map(k => s""""$k": "reason $k"""").mkString("{", ", ", "}")
      val out = LlmJsonRepair.extract(json)
      out == keys.map(k => k.toString -> s"reason $k").toMap
    }

  property("fenced wrapping never changes the extraction") =
    Prop.forAll(keyGen) { keys =>
      val json = keys.map(k => s""""$k": "r$k"""").mkString("{", ", ", "}")
      LlmJsonRepair.extract(s"```json\n$json\n```") == LlmJsonRepair.extract(json)
    }

  property("validateKeys output keys contain no commas and preserve values") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.choose(1, 9999)))) { groups =>
      val in = groups.zipWithIndex.map { case (g, i) => g.mkString(",") -> s"v$i" }.toMap
      val out = LlmJsonRepair.validateKeys(in)
      out.keys.forall(!_.contains(',')) && out.values.toSet.subsetOf(in.values.toSet)
    }

  property("validateOutcome removes exactly the approved-mentioning entries") =
    Prop.forAll(Gen.mapOf(Gen.zip(Gen.alphaNumStr, Gen.oneOf(
      Gen.const("service Approved fine"), Gen.alphaNumStr)))) { m =>
      val out = LlmJsonRepair.validateOutcome(m)
      out.forall { case (_, v) => !v.toLowerCase.contains("approved") } &&
        m.filterNot { case (_, v) => v != null && v.toLowerCase.contains("approved") } == out
    }

  property("firstBalancedObject finds a parseable object whenever one is embedded") =
    Prop.forAll(keyGen, Gen.alphaStr, Gen.alphaStr) { (keys, pre, post) =>
      val json = keys.map(k => s""""$k": "x"""").mkString("{", ", ", "}")
      LlmJsonRepair.firstBalancedObject(pre + json + post).contains(json)
    }
}
